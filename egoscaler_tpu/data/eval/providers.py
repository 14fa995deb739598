"""HOT3D evaluation-data providers (CSV-backed, numpy).

Rebuild of the vendored Meta hot3d loader family
(egoscaler/data/eval/data_loaders/: ObjectPose3dProvider,
HeadsetPose3dProvider, ObjectLibrary, Hot3dDataPathProvider) and the
facade (egoscaler/data/eval/dataset_api.py:54-240) — without torch.
Only the CSV/JSON-backed providers are reimplemented; VRS image streams
ride the optional projectaria adapter like the training side.

CSV schemas (hot3d toolkit):
  dynamic_objects.csv: object_uid, timestamp[ns], t_wo_{x,y,z}[m],
                       q_wo_{w,x,y,z}
  headset_trajectory.csv: same fields for the device pose (t_ws / q_ws).
Poses are SE(3) world<-object; quaternions stored (w, x, y, z).
"""
from __future__ import annotations

import csv
import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from egoscaler_tpu.geometry.rotations import matrix_from_quat


@dataclasses.dataclass
class Pose3d:
    """SE(3) world-from-object."""

    rotation: np.ndarray      # (3, 3)
    translation: np.ndarray   # (3,)

    @staticmethod
    def from_quat_wxyz(qw, qx, qy, qz, t) -> "Pose3d":
        quat_xyzw = np.array([qx, qy, qz, qw], np.float64)
        rot = np.asarray(matrix_from_quat(quat_xyzw.astype(np.float32)))
        return Pose3d(rot, np.asarray(t, np.float64))

    def matrix(self) -> np.ndarray:
        m = np.eye(4)
        m[:3, :3] = self.rotation
        m[:3, 3] = self.translation
        return m

    def inverse(self) -> "Pose3d":
        rt = self.rotation.T
        return Pose3d(rt, -rt @ self.translation)

    def __matmul__(self, other: "Pose3d") -> "Pose3d":
        return Pose3d(
            self.rotation @ other.rotation,
            self.rotation @ other.translation + self.translation,
        )

    def apply(self, pts: np.ndarray) -> np.ndarray:
        return pts @ self.rotation.T + self.translation


def _read_pose_csv(path: str, prefix: str = "wo") -> Dict[int, Dict[str, Pose3d]]:
    """Both dynamic_objects.csv and headset_trajectory.csv use the shared
    POSE_DATA_CSV_COLUMNS schema (constants.py:15-25: object_uid +
    t_wo_*/q_wo_*) — the headset rides as just another tracked object.
    The prefix is auto-detected from the header for schema variants."""
    out: Dict[int, Dict[str, Pose3d]] = {}
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        ix = {name: i for i, name in enumerate(header)}
        if f"q_{prefix}_w" not in ix:
            prefixes = {
                n.split("_")[1] for n in ix if n.startswith("q_") and n.endswith("_w")
            }
            if not prefixes:
                raise ValueError(f"{path}: no quaternion columns in {header}")
            prefix = sorted(prefixes)[0]
        for row in reader:
            ts = int(row[ix["timestamp[ns]"]])
            uid = str(row[ix["object_uid"]]) if "object_uid" in ix else "device"
            pose = Pose3d.from_quat_wxyz(
                float(row[ix[f"q_{prefix}_w"]]),
                float(row[ix[f"q_{prefix}_x"]]),
                float(row[ix[f"q_{prefix}_y"]]),
                float(row[ix[f"q_{prefix}_z"]]),
                [
                    float(row[ix[f"t_{prefix}_x[m]"]]),
                    float(row[ix[f"t_{prefix}_y[m]"]]),
                    float(row[ix[f"t_{prefix}_z[m]"]]),
                ],
            )
            out.setdefault(ts, {})[uid] = pose
    return out


class ObjectPose3dProvider:
    """Dynamic object GT poses (ObjectPose3dProvider.py:61-176)."""

    def __init__(self, csv_path: str):
        self._poses = _read_pose_csv(csv_path, "wo")
        self.timestamps = np.array(sorted(self._poses), np.int64)
        uids = set()
        for c in self._poses.values():
            uids.update(c)
        self.object_uids = sorted(uids)

    def get_pose_at_timestamp(
        self,
        timestamp_ns: int,
        acceptable_time_delta_ns: Optional[int] = None,
    ) -> Optional[Tuple[Dict[str, Pose3d], int]]:
        """Closest-timestamp collection + time delta (CLOSEST query)."""
        if len(self.timestamps) == 0:
            return None
        i = int(np.argmin(np.abs(self.timestamps - timestamp_ns)))
        ts = int(self.timestamps[i])
        dt = ts - timestamp_ns
        if (
            acceptable_time_delta_ns is not None
            and abs(dt) > acceptable_time_delta_ns
        ):
            return None
        return self._poses[ts], dt

    def get_data_statistics(self) -> dict:
        """ObjectPose3dProvider.get_data_statistics
        (test_ObjectPose3dProvider.py:51 asserts non-empty)."""
        return {
            "num_frames": len(self.timestamps),
            "num_objects": len(self.object_uids),
            "object_uids": list(self.object_uids),
        }

    def trajectory(self, uid: str) -> Tuple[np.ndarray, np.ndarray]:
        """(timestamps, positions (T, 3)) for one object."""
        ts, pos = [], []
        for t in self.timestamps:
            c = self._poses[int(t)]
            if uid in c:
                ts.append(t)
                pos.append(c[uid].translation)
        return np.asarray(ts), np.stack(pos) if pos else np.zeros((0, 3))


class HeadsetPose3dProvider:
    """Device GT poses (HeadsetPose3dProvider.py:46)."""

    def __init__(self, csv_path: str):
        self._poses = _read_pose_csv(csv_path, "ws")
        self.timestamps = np.array(sorted(self._poses), np.int64)

    def get_pose_at_timestamp(
        self, timestamp_ns: int,
        acceptable_time_delta_ns: Optional[int] = None,
    ) -> Optional[Tuple[Pose3d, int]]:
        if len(self.timestamps) == 0:
            return None
        i = int(np.argmin(np.abs(self.timestamps - timestamp_ns)))
        ts = int(self.timestamps[i])
        dt = ts - timestamp_ns
        if (
            acceptable_time_delta_ns is not None
            and abs(dt) > acceptable_time_delta_ns
        ):
            return None
        return next(iter(self._poses[ts].values())), dt


@dataclasses.dataclass
class ObjectLibrary:
    """CAD object metadata (loader_object_library.py:22): uid -> name and
    axis-aligned bounding box of the mesh."""

    root: str
    uid_to_name: Dict[str, str]
    uid_to_bbox: Dict[str, np.ndarray]  # (2, 3) min/max

    @staticmethod
    def load(root: str) -> "ObjectLibrary":
        inst = os.path.join(root, "instance.json")
        uid_to_name, uid_to_bbox = {}, {}
        if os.path.exists(inst):
            with open(inst) as f:
                meta = json.load(f)
            for uid, info in meta.items():
                uid_to_name[uid] = info.get("instance_name", uid)
                if "bbox_min" in info and "bbox_max" in info:
                    uid_to_bbox[uid] = np.asarray(
                        [info["bbox_min"], info["bbox_max"]], np.float64
                    )
        return ObjectLibrary(root, uid_to_name, uid_to_bbox)


@dataclasses.dataclass
class Hot3dDataPathProvider:
    """Per-sequence file layout (PathProvider.py:80)."""

    sequence_folder: str

    @property
    def dynamic_objects_file(self) -> str:
        return os.path.join(self.sequence_folder, "dynamic_objects.csv")

    @property
    def headset_trajectory_file(self) -> str:
        for name in ("headset_trajectory.csv", "aria_trajectory.csv"):
            p = os.path.join(self.sequence_folder, name)
            if os.path.exists(p):
                return p
        return os.path.join(self.sequence_folder, "headset_trajectory.csv")

    @property
    def vrs_file(self) -> str:
        return os.path.join(self.sequence_folder, "recording.vrs")

    @property
    def metadata_file(self) -> str:
        return os.path.join(self.sequence_folder, "metadata.json")

    @property
    def box2d_objects_file(self) -> str:
        return os.path.join(self.sequence_folder, "box2d_objects.csv")

    @property
    def box2d_hands_file(self) -> str:
        return os.path.join(self.sequence_folder, "box2d_hands.csv")

    @property
    def masks_folder(self) -> str:
        return os.path.join(self.sequence_folder, "masks")

    @property
    def mano_hand_pose_trajectory_file(self) -> str:
        return os.path.join(
            self.sequence_folder, "mano_hand_pose_trajectory.jsonl"
        )

    @property
    def umetrack_hand_pose_trajectory_file(self) -> str:
        return os.path.join(
            self.sequence_folder, "umetrack_hand_pose_trajectory.jsonl"
        )

    @property
    def camera_models_file(self) -> str:
        """PathProvider.py:105-106."""
        return os.path.join(self.sequence_folder, "camera_models.json")


@dataclasses.dataclass(frozen=True)
class CameraModel:
    """One entry of camera_models.json (Quest sequences ship it; the
    reference loads it through projectaria's device calibration and
    test_QuestDataProvider asserts the FISHEYE624 types).  Projection
    params layout: [fx, fy, cx, cy, k0..k5, p0, p1, s0..s3]."""

    label: str
    model_type: str            # e.g. "CameraModelType.FISHEYE624"
    width: int
    height: int
    projection_params: Tuple[float, ...]
    T_device_camera: Pose3d
    max_solid_angle: float = 0.0

    def fisheye(self):
        """ops/undistort.Fisheye624 for this calibration (fx==fy on all
        shipped Quest/Aria calibrations; asserted)."""
        from egoscaler_tpu.ops.undistort import Fisheye624

        p = self.projection_params
        assert abs(p[0] - p[1]) < 1e-3 * max(abs(p[0]), 1.0), (
            "anisotropic focal lengths unsupported", p[:2]
        )
        return Fisheye624(
            f=p[0], cx=p[2], cy=p[3], ks=tuple(p[4:10]),
            ps=(p[10], p[11]), ss=tuple(p[12:16]),
        )


def load_camera_models(path: str) -> Optional[Dict[str, CameraModel]]:
    """camera_models.json -> {label: CameraModel}, None when absent."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        entries = json.load(f)
    out: Dict[str, CameraModel] = {}
    for e in entries:
        tdc = e["T_Device_Camera"]
        qw, qx, qy, qz = tdc["quaternion_wxyz"]
        pose = Pose3d.from_quat_wxyz(qw, qx, qy, qz, tdc["translation_xyz"])
        out[e["label"]] = CameraModel(
            label=e["label"],
            model_type=e["projectionModelType"],
            width=int(e["imageWidth"]),
            height=int(e["imageHeight"]),
            projection_params=tuple(
                float(v) for v in e["projectionParams"]
            ),
            T_device_camera=pose,
            max_solid_angle=float(e.get("maxSolidAngle", 0.0)),
        )
    return out


class Hot3dDataProvider:
    """Facade bundling per-sequence providers (dataset_api.py:54-240)."""

    def __init__(self, sequence_folder: str,
                 object_library: Optional[ObjectLibrary] = None):
        self.paths = Hot3dDataPathProvider(sequence_folder)
        self.object_library = object_library
        self.object_pose_data_provider = ObjectPose3dProvider(
            self.paths.dynamic_objects_file
        )
        self.device_pose_data_provider = (
            HeadsetPose3dProvider(self.paths.headset_trajectory_file)
            if os.path.exists(self.paths.headset_trajectory_file)
            else None
        )
        self.metadata = {}
        if os.path.exists(self.paths.metadata_file):
            with open(self.paths.metadata_file) as f:
                self.metadata = json.load(f)

        # Optional annotation streams (dataset_api.py:101-135); loaders
        # return None when the file is absent.
        from egoscaler_tpu.data.eval import streams

        self.object_box2d_data_provider = streams.load_object_box2d_csv(
            self.paths.box2d_objects_file
        )
        self.hand_box2d_data_provider = streams.load_hand_box2d_csv(
            self.paths.box2d_hands_file
        )
        self.mano_hand_data_provider = streams.load_hand_poses(
            self.paths.mano_hand_pose_trajectory_file
        )
        self.umetrack_hand_data_provider = streams.load_hand_poses(
            self.paths.umetrack_hand_pose_trajectory_file
        )
        self.camera_models = load_camera_models(
            self.paths.camera_models_file
        )
        self.mask_data: Dict[str, "streams.MaskData"] = {}
        if os.path.isdir(self.paths.masks_folder):
            for name in sorted(os.listdir(self.paths.masks_folder)):
                if name.endswith(".csv"):
                    mask = streams.load_mask_csv(
                        os.path.join(self.paths.masks_folder, name)
                    )
                    if mask is not None:
                        self.mask_data[name[: -len(".csv")]] = mask

    def get_device_type(self) -> str:
        return self.metadata.get("headset", "Aria")

    def get_data_statistics(self) -> Dict[str, dict]:
        """Aggregate per-provider statistics (dataset_api.py:150-180)."""
        stats: Dict[str, dict] = {}
        if self.object_pose_data_provider is not None:
            stats["objects"] = {
                "num_frames": len(self.object_pose_data_provider.timestamps),
                "num_objects": len(self.object_pose_data_provider.object_uids),
            }
        if self.object_box2d_data_provider is not None:
            stats["object_box2ds"] = (
                self.object_box2d_data_provider.get_data_statistics()
            )
        if self.hand_box2d_data_provider is not None:
            stats["hand_box2ds"] = (
                self.hand_box2d_data_provider.get_data_statistics()
            )
        if self.mask_data:
            stats["masks"] = {k: v.stats() for k, v in self.mask_data.items()}
        return stats
