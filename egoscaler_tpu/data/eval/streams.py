"""HOT3D per-stream annotation providers: 2D boxes, masks, hand poses.

Rebuild of the vendored hot3d loaders that need no projectaria:
  * ObjectBox2dDataProvider.py / HandBox2dDataProvider.py — per-stream
    CSV box trajectories with CLOSEST/BEFORE/AFTER timestamp queries.
    Both are the same structure keyed differently (object_uid vs
    hand_index), so here one generic `Box2dProvider` serves both.
  * loader_masks.py — per-stream boolean masks + logical combination.
  * loader_hand_poses.py — MANO (pose_pca) / UmeTrack (joint_angles)
    hand wrist poses from jsonl.  Mesh/landmark skinning lives in
    hand_skinning.py (UmeTrack FK+LBS asset-free; MANO gated on the
    licensed pickle, math tested on synthetic assets).
  * pose_utils.py query_left_right / lookup_timestamp.

Stream ids are plain strings ("214-1", "1201-1", ...) — no
projectaria StreamId dependency.
"""
from __future__ import annotations

import bisect
import csv
import dataclasses
import enum
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from egoscaler_tpu.data.eval.providers import Pose3d


class TimeQueryOptions(enum.Enum):
    """projectaria TimeQueryOptions equivalent (pose_utils.py:46-99)."""

    CLOSEST = "closest"
    BEFORE = "before"
    AFTER = "after"


def query_left_right(
    ordered_timestamps: Sequence[int], query_timestamp: int
) -> Tuple[Optional[int], Optional[int], Optional[float]]:
    """Bracketing timestamps by bisection (pose_utils.py:21-43)."""
    idx = bisect.bisect_left(ordered_timestamps, query_timestamp)
    lower = ordered_timestamps[idx - 1] if idx > 0 else None
    upper = ordered_timestamps[idx] if idx < len(ordered_timestamps) else None
    alpha = None
    if lower is not None and upper is not None:
        alpha = (query_timestamp - lower) / (upper - lower)
    return lower, upper, alpha


def lookup_timestamp(
    time_indexed: Dict[int, Any],
    sorted_timestamps: Optional[Sequence[int]],
    query_timestamp: int,
    options: TimeQueryOptions,
) -> Tuple[Optional[Any], Optional[int]]:
    """(value, signed time delta) at/near a timestamp (pose_utils.py:46-99)."""
    if sorted_timestamps is None:
        sorted_timestamps = sorted(time_indexed)
    if query_timestamp in time_indexed:
        return time_indexed[query_timestamp], 0
    lower, upper, _ = query_left_right(sorted_timestamps, query_timestamp)
    if options is TimeQueryOptions.BEFORE:
        pick = lower
    elif options is TimeQueryOptions.AFTER:
        pick = upper
    else:  # CLOSEST
        candidates = [t for t in (lower, upper) if t is not None]
        pick = (
            min(candidates, key=lambda t: abs(t - query_timestamp))
            if candidates
            else None
        )
    if pick is None:
        return None, None
    return time_indexed[pick], query_timestamp - pick


def _check_columns(header: Sequence[str], required: Sequence[str]):
    missing = [c for c in required if c not in header]
    if missing:
        raise ValueError(f"CSV missing required columns: {missing}")


# ---------------------------------------------------------------------------
# 2D boxes


@dataclasses.dataclass
class AlignedBox2d:
    """Axis-aligned box, origin top-left, right/bottom exclusive
    (AlignedBox2d.py:20-60)."""

    left: float
    top: float
    right: float
    bottom: float

    @property
    def width(self) -> float:
        return self.right - self.left

    @property
    def height(self) -> float:
        return self.bottom - self.top

    def array(self) -> np.ndarray:
        return np.array([self.left, self.top, self.right, self.bottom])


@dataclasses.dataclass
class Box2dEntry:
    """One annotated box: geometry (None when occluded/absent) +
    visibility (ObjectBox2dDataProvider.py:38-42)."""

    box2d: Optional[AlignedBox2d]
    visibility_ratio: Optional[float]


@dataclasses.dataclass
class Box2dCollection:
    """All boxes of one frame, keyed by object uid (str) or hand index
    (int)."""

    timestamp_ns: int
    box2ds: Dict[Any, Box2dEntry]

    @property
    def uid_list(self):
        return set(self.box2ds.keys())


@dataclasses.dataclass
class Box2dCollectionWithDt:
    box2d_collection: Box2dCollection
    time_delta_ns: int


BOX2D_COLUMNS = (
    "stream_id",
    "timestamp[ns]",
    "x_min[pixel]",
    "x_max[pixel]",
    "y_min[pixel]",
    "y_max[pixel]",
    "visibility_ratio[%]",
)


class Box2dProvider:
    """Per-stream 2D-box trajectories (ObjectBox2dDataProvider.py:67-147,
    HandBox2dDataProvider.py:62-130 — one generic implementation)."""

    def __init__(self, trajectories: Dict[str, Dict[int, Box2dCollection]]):
        self._trajectories = trajectories
        self._sorted_ts = {
            sid: sorted(traj) for sid, traj in trajectories.items()
        }

    @property
    def stream_ids(self) -> List[str]:
        return list(self._trajectories.keys())

    @property
    def uids(self) -> set:
        return {
            uid
            for traj in self._trajectories.values()
            for coll in traj.values()
            for uid in coll.uid_list
        }

    def get_timestamp_ns_list(self, stream_id: str) -> Optional[List[int]]:
        return self._sorted_ts.get(str(stream_id))

    def get_box2d_at_timestamp(
        self,
        stream_id: str,
        timestamp_ns: int,
        time_query_options: TimeQueryOptions = TimeQueryOptions.CLOSEST,
        acceptable_time_delta: Optional[int] = None,
    ) -> Optional[Box2dCollectionWithDt]:
        stream_id = str(stream_id)
        if stream_id not in self._trajectories:
            raise ValueError(f"Box2d trajectory not available for stream {stream_id}.")
        coll, dt = lookup_timestamp(
            self._trajectories[stream_id],
            self._sorted_ts[stream_id],
            timestamp_ns,
            time_query_options,
        )
        if coll is None or dt is None:
            return None
        if acceptable_time_delta is not None and abs(dt) > acceptable_time_delta:
            return None
        return Box2dCollectionWithDt(coll, dt)

    def get_data_statistics(self) -> Dict[str, Any]:
        return {
            "num_frames": {k: len(v) for k, v in self._sorted_ts.items()},
            "stream_ids": self.stream_ids,
            "num_uids": len(self.uids),
        }


def _parse_float(text: str) -> Optional[float]:
    try:
        return float(text)
    except (TypeError, ValueError):
        return None


def _load_box2d_csv(path: str, key_column: str, key_type) -> Optional[Box2dProvider]:
    if not os.path.exists(path):
        return None
    trajectories: Dict[str, Dict[int, Box2dCollection]] = {}
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        _check_columns(header, BOX2D_COLUMNS + (key_column,))
        ix = {name: i for i, name in enumerate(header)}
        for row in reader:
            sid = str(row[ix["stream_id"]])
            ts = int(row[ix["timestamp[ns]"]])
            key = key_type(row[ix[key_column]])
            vis = _parse_float(row[ix["visibility_ratio[%]"]])
            x_min = _parse_float(row[ix["x_min[pixel]"]])
            box = None
            if x_min is not None:
                box = AlignedBox2d(
                    left=x_min,
                    top=float(row[ix["y_min[pixel]"]]),
                    right=float(row[ix["x_max[pixel]"]]),
                    bottom=float(row[ix["y_max[pixel]"]]),
                )
            coll = trajectories.setdefault(sid, {}).setdefault(
                ts, Box2dCollection(timestamp_ns=ts, box2ds={})
            )
            coll.box2ds[key] = Box2dEntry(box2d=box, visibility_ratio=vis)
    return Box2dProvider(trajectories)


def load_object_box2d_csv(path: str) -> Optional[Box2dProvider]:
    """box2d_objects.csv, keyed by object uid (ObjectBox2dDataProvider.py:199)."""
    return _load_box2d_csv(path, "object_uid", str)


def load_hand_box2d_csv(path: str) -> Optional[Box2dProvider]:
    """box2d_hands.csv, keyed by hand index 0=left/1=right
    (HandBox2dDataProvider.py:133)."""
    return _load_box2d_csv(path, "hand_index", int)


# ---------------------------------------------------------------------------
# Frame-validity masks


MASK_COLUMNS = ("timestamp[ns]", "stream_id", "mask")


class MaskData:
    """Per-stream boolean frame masks (loader_masks.py:29-70)."""

    def __init__(self, masks: Optional[Dict[str, Dict[int, bool]]] = None):
        self._masks = masks or {}

    @property
    def data(self) -> Dict[str, Dict[int, bool]]:
        return self._masks

    @property
    def stream_ids(self) -> List[str]:
        return list(self._masks.keys())

    def stream_mask(self, stream_id: str) -> Optional[Dict[int, bool]]:
        return self._masks.get(str(stream_id))

    def length(self, stream_id: str) -> int:
        return len(self._masks.get(str(stream_id), {}))

    def num_true(self, stream_id: str) -> int:
        return sum(self._masks.get(str(stream_id), {}).values())

    def num_false(self, stream_id: str) -> int:
        return self.length(stream_id) - self.num_true(stream_id)

    def stats(self) -> Dict[str, Dict[str, int]]:
        return {
            sid: {
                "length": self.length(sid),
                "num_true": self.num_true(sid),
                "num_false": self.num_false(sid),
            }
            for sid in sorted(self._masks)
        }


def load_mask_csv(path: str) -> Optional[MaskData]:
    """masks/mask_*.csv (loader_masks.py:73-100)."""
    if not os.path.exists(path):
        return None
    masks: Dict[str, Dict[int, bool]] = {}
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        _check_columns(header, MASK_COLUMNS)
        ix = {name: i for i, name in enumerate(header)}
        for row in reader:
            sid = str(row[ix["stream_id"]])
            ts = int(row[ix["timestamp[ns]"]])
            masks.setdefault(sid, {})[ts] = row[ix["mask"]] == "True"
    return MaskData(masks)


def combine_masks(mask_list: Sequence[MaskData], operator: str = "and") -> MaskData:
    """Logical AND/OR across aligned mask files (loader_masks.py:103-157)."""
    if not mask_list:
        raise ValueError("mask_list must not be empty")
    if operator not in ("and", "or"):
        raise ValueError(f"Invalid operator {operator!r}")
    stream_ids = {sid for m in mask_list for sid in m.stream_ids}
    out: Dict[str, Dict[int, bool]] = {}
    for sid in stream_ids:
        per_stream = [m.stream_mask(sid) for m in mask_list]
        if any(s is None for s in per_stream):
            raise ValueError("mask data must be present for all streams")
        ts_ref = list(per_stream[0])
        for s in per_stream[1:]:
            if list(s) != ts_ref:
                raise ValueError("Mask data must have the same timestamps")
        acc = np.array([per_stream[0][t] for t in ts_ref], bool)
        for s in per_stream[1:]:
            vals = np.array([s[t] for t in ts_ref], bool)
            acc = acc & vals if operator == "and" else acc | vals
        out[sid] = dict(zip(ts_ref, acc.tolist()))
    return MaskData(out)


# ---------------------------------------------------------------------------
# Hand poses (MANO / UmeTrack)


LEFT_HAND_INDEX = 0
RIGHT_HAND_INDEX = 1


class Handedness(enum.Enum):
    Left = LEFT_HAND_INDEX
    Right = RIGHT_HAND_INDEX


@dataclasses.dataclass
class HandPose:
    """Wrist SE(3) + articulation parameters (loader_hand_poses.py:37-53).

    `joint_angles` is the MANO pose_pca vector or the UmeTrack
    joint-angle vector depending on the source file; `betas` carries the
    MANO shape parameters when present.  Posing full meshes/landmarks
    from these parameters is `hand_skinning.ManoHandMeshProvider` /
    `hand_skinning.UmeTrackHandMeshProvider`.
    """

    handedness: Handedness
    wrist_pose: Optional[Pose3d]
    joint_angles: Optional[List[float]]
    betas: Optional[List[float]] = None

    def is_left_hand(self) -> bool:
        return self.handedness == Handedness.Left

    def is_right_hand(self) -> bool:
        return self.handedness == Handedness.Right

    def handedness_label(self) -> str:
        return "left" if self.is_left_hand() else "right"


@dataclasses.dataclass
class HandPose3dCollection:
    timestamp_ns: int
    poses: Dict[Handedness, HandPose]


class HandPoseProvider:
    """Timestamped hand poses with CLOSEST/BEFORE/AFTER queries
    (HandDataProviderBase over loader_hand_poses.py:93-137)."""

    def __init__(self, poses: Dict[int, HandPose3dCollection]):
        self._poses = poses
        self._sorted_ts = sorted(poses)

    @property
    def timestamps(self) -> List[int]:
        return list(self._sorted_ts)

    def get_pose_at_timestamp(
        self,
        timestamp_ns: int,
        time_query_options: TimeQueryOptions = TimeQueryOptions.CLOSEST,
        acceptable_time_delta_ns: Optional[int] = None,
    ) -> Optional[Tuple[HandPose3dCollection, int]]:
        coll, dt = lookup_timestamp(
            self._poses, self._sorted_ts, timestamp_ns, time_query_options
        )
        if coll is None or dt is None:
            return None
        if (
            acceptable_time_delta_ns is not None
            and abs(dt) > acceptable_time_delta_ns
        ):
            return None
        return coll, dt

    def get_data_statistics(self) -> Dict[str, int]:
        """HandDataProviderBase.get_data_statistics: frame count plus
        per-handedness totals (test_HandDataProvider.py:82-85 asserts
        all three are positive on the sample sequences)."""
        n_left = sum(
            1 for c in self._poses.values() if Handedness.Left in c.poses
        )
        n_right = sum(
            1 for c in self._poses.values() if Handedness.Right in c.poses
        )
        return {
            "num_frames": len(self._poses),
            "num_left_hands": n_left,
            "num_right_hands": n_right,
        }


def load_hand_poses(path: str) -> Optional[HandPoseProvider]:
    """{mano,umetrack}_hand_pose_trajectory.jsonl
    (loader_hand_poses.py:93-137).  Wrist quaternions are stored wxyz."""
    if not os.path.exists(path):
        return None
    poses: Dict[int, HandPose3dCollection] = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            ts = int(rec["timestamp_ns"])
            for handedness in (Handedness.Left, Handedness.Right):
                entry = rec["hand_poses"].get(str(handedness.value))
                if entry is None:
                    continue
                wrist = entry.get("wrist_xform")
                pose = None
                if wrist is not None:
                    qw, qx, qy, qz = [float(v) for v in wrist["q_wxyz"]]
                    pose = Pose3d.from_quat_wxyz(qw, qx, qy, qz, wrist["t_xyz"])
                angles = entry.get("pose", entry.get("joint_angles"))
                poses.setdefault(
                    ts, HandPose3dCollection(timestamp_ns=ts, poses={})
                ).poses[handedness] = HandPose(
                    handedness=handedness,
                    wrist_pose=pose,
                    joint_angles=angles,
                    betas=entry.get("betas"),
                )
    return HandPoseProvider(poses)
