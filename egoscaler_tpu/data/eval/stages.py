"""HOT3D eval-pipeline stages 1-4 (egoscaler/data/eval/*.py rebuilt).

Stage 1 (1_get_image.py): Aria VRS -> 4 s segments -> pinhole JPEGs
  (TIME_CODE domain) — VRS decode rides the projectaria adapter.
Stage 2 (2_get_manipulated_object.py): GT-pose travel-distance object
  selection (>= 10 cm).
Stage 3 (3_get_desc_timestamp.py): action description + start/end from
  8 numbered frames — VLM adapter or the motion localizer.
Stage 4 (4_get_object_trajectory.py): GT 6DoF trajectory pickles via
  data/eval/gt_trajectory.py.

All stages write the same infos/images/trajs layout as the training
side so the model-side dataset consumes either split identically.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
from glob import glob
from typing import Dict, List, Optional

import numpy as np

from egoscaler_tpu.configs import CameraConfig
from egoscaler_tpu.data.eval.gt_trajectory import (
    extract_gt_trajectory,
    segment_timestamps,
    select_manipulated_object,
)
from egoscaler_tpu.data.eval.providers import Hot3dDataProvider, ObjectLibrary
from egoscaler_tpu.pipelines.stages.common import read_json, write_json

_CAM = CameraConfig()
SEGMENT_NS = int(4e9)  # 4-second segments (eval 1_get_image.py)


def sequence_segments(provider: Hot3dDataProvider) -> List[tuple]:
    ts = provider.object_pose_data_provider.timestamps
    if len(ts) == 0:
        return []
    segments = list(range(int(ts[0]), int(ts[-1]), SEGMENT_NS))
    return list(zip(segments, segments[1:]))


def stage2_manipulated_object(
    data_dir: str, sequence_dirs: List[str],
    object_library: Optional[ObjectLibrary] = None,
) -> List[Dict]:
    """Per 4 s segment: pick the moving object, write infos/ stubs."""
    out = []
    for seq_dir in sequence_dirs:
        provider = Hot3dDataProvider(seq_dir, object_library)
        video_uid = os.path.basename(seq_dir.rstrip("/"))
        for start_ns, end_ns in sequence_segments(provider):
            uid = select_manipulated_object(provider, start_ns, end_ns)
            if uid is None:
                continue
            file_name = str(int((end_ns + start_ns) / 2))
            name = (
                object_library.uid_to_name.get(uid, uid)
                if object_library else uid
            )
            data = {
                "dataset_name": "hot3d",
                "video_uid": video_uid,
                "file_name": file_name,
                "object_id": uid,
                "manipulated_object": name,
                "start_ns": start_ns,
                "end_ns": end_ns,
            }
            write_json(
                os.path.join(
                    data_dir, "infos", "hot3d", video_uid, file_name + ".json"
                ),
                data,
            )
            out.append(data)
    return out


def stage3_desc_timestamp(
    data_dir: str,
    localizer=None,
    describer=None,
) -> List[Dict]:
    """Action description + start/end seconds per segment.

    `describer(frames) -> str` is the VLM adapter; without one, the
    description falls back to 'manipulate the {object}', and timestamps
    come from GT motion (the object's own travel profile when frames are
    absent)."""
    from egoscaler_tpu.pipelines.stages.stage5_timestamps import MotionLocalizer

    localizer = localizer or MotionLocalizer()
    updated = []
    for f in sorted(glob(os.path.join(data_dir, "infos", "hot3d", "*", "*.json"))):
        data = read_json(f)
        if "start_sec" in data:
            continue
        images_dir = os.path.join(
            data_dir, "images", "hot3d", data["video_uid"], data["file_name"]
        )
        frame_files = sorted(glob(os.path.join(images_dir, "*.jpg")))
        if frame_files:
            from PIL import Image

            frames = np.stack(
                [np.asarray(Image.open(p)) for p in frame_files[::4]]
            )
            s, e = localizer.localize(frames)
            times = [float(os.path.splitext(os.path.basename(p))[0])
                     for p in frame_files[::4]]
            data["start_sec"] = times[s]
            data["end_sec"] = times[e]
        else:
            # GT fallback: whole segment
            data["start_sec"] = data["start_ns"] / 1e9
            data["end_sec"] = data["end_ns"] / 1e9
        if describer is not None:
            data["action_description"] = describer(images_dir)
        else:
            data.setdefault(
                "action_description",
                f"manipulate the {data['manipulated_object']}",
            )
        write_json(f, data)
        updated.append(data)
    return updated


def stage4_gt_trajectory(
    data_dir: str,
    sequence_root: str,
    object_library: Optional[ObjectLibrary] = None,
    depth_model=None,
) -> int:
    """GT trajectory pickles (same schema as the training stage 7)."""
    n = 0
    for f in sorted(glob(os.path.join(data_dir, "infos", "hot3d", "*", "*.json"))):
        data = read_json(f)
        if "start_sec" not in data:
            continue
        video_uid = data["video_uid"]
        out_path = os.path.join(
            data_dir, "trajs", "hot3d", video_uid, data["file_name"] + ".pkl"
        )
        if os.path.exists(out_path):
            continue
        provider = Hot3dDataProvider(
            os.path.join(sequence_root, video_uid), object_library
        )
        ts = segment_timestamps(
            int(data["start_sec"] * 1e9), int(data["end_sec"] * 1e9),
            _CAM.fps,
        )
        bbox = (
            object_library.uid_to_bbox.get(data["object_id"])
            if object_library else None
        )
        traj = extract_gt_trajectory(
            provider, data["object_id"], ts, bbox_min_max=bbox,
            focal_len=_CAM.aria.focal_len,
            principal_point=_CAM.aria.principal_point,
        )
        if traj is None:
            continue
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "wb") as fh:
            pickle.dump(traj, fh)
        n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, required=True, choices=[2, 3, 4])
    p.add_argument("--data_dir", required=True)
    p.add_argument("--sequence_root", default=None)
    p.add_argument("--object_library", default=None)
    args = p.parse_args()
    lib = ObjectLibrary.load(args.object_library) if args.object_library else None
    if args.stage == 2:
        seqs = sorted(glob(os.path.join(args.sequence_root, "*")))
        stage2_manipulated_object(args.data_dir, seqs, lib)
    elif args.stage == 3:
        stage3_desc_timestamp(args.data_dir)
    else:
        stage4_gt_trajectory(args.data_dir, args.sequence_root, lib)


if __name__ == "__main__":
    main()
