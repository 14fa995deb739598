"""HOD preprocessing stage: hand/object detections per candidate clip.

Rebuild of the reference's HOD pickle producer
(third_party/hand_object_detector/X_prepare_for_egoscaler.py:23-87):
for every candidate with localized timestamps, run the hand-object
detector on each frame of the [start_sec, end_sec] window and write

    hods/{dataset}/{video_uid}/{file_name}.pkl
        = {t: {"obj-bbox": [[x1,y1,x2,y2], ...],
               "hand-bbox": [[x1,y1,x2,y2, state, side], ...]}}

(the reference appends contact state and hand side to each hand box —
X_prepare:16-21).  Stage 7 arbitrates object-mask candidates with these
boxes (stage7_trajectory.process_clip).

Detector backends: 'heuristic' (skin+motion HeuristicHOD, weight-free)
or 'trained' (models/hand_object.HandObjectRCNN with the checked-in
synthetic-trained asset or a --hod_checkpoint .npz).
"""
from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

from egoscaler_tpu.pipelines.stages.common import (
    list_stage_files,
    read_json,
    shard_files,
)


def build_hod(kind: str = "heuristic", checkpoint: Optional[str] = None):
    """Detector factory mirroring build_segmenter/build_tracker."""
    if kind == "heuristic":
        from egoscaler_tpu.models.hand_object import HeuristicHOD

        return HeuristicHOD()
    from flax import traverse_util

    from egoscaler_tpu.models.hand_object import HOD, HODConfig

    path = checkpoint or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "assets", "hod_synthetic.npz",
    )
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"trained HOD weights not found at {path}; run "
            "scripts/train_hod.py or pass --hod_checkpoint"
        )
    with np.load(path) as z:
        params = traverse_util.unflatten_dict(
            {k: z[k] for k in z.files}, sep="/"
        )
    return HOD(cfg=HODConfig().tiny(), params=params, input_size=128)


def detect_pair(detector, frame: np.ndarray, next_frame: np.ndarray
                ) -> Tuple[list, list]:
    """One frame -> (obj boxes, hand boxes+[state, side]) in the
    reference pickle schema (X_prepare get_bbox:10-21)."""
    from egoscaler_tpu.models.hand_object import HOD, HeuristicHOD

    if isinstance(detector, HeuristicHOD):
        res = detector.detect_clip(np.stack([frame, next_frame]))
    else:
        res = detector.detect(frame)
    o_bboxes = [[int(v) for v in b[:4]] for b in res["obj-bbox"]]
    h_bboxes = []
    for i, b in enumerate(res["hand-bbox"]):
        state = res["state"][i] if i < len(res["state"]) else 0
        side = res["side"][i] if i < len(res["side"]) else 0
        h_bboxes.append([int(v) for v in b[:4]] + [int(state), int(side)])
    return o_bboxes, h_bboxes


def process_candidate(data: Dict, data_dir: str, detector) -> Optional[str]:
    """One candidate -> hods pickle path, or None when skipped."""
    from PIL import Image

    from egoscaler_tpu.data.adapters.egoexo4d import clip_duration

    ds, uid, fname = (
        data["dataset_name"], data["video_uid"], data["file_name"]
    )
    if data.get("start_sec") is None or "start_sec" not in data:
        return None
    out_path = f"{data_dir}/hods/{ds}/{uid}/{fname}.pkl"
    if os.path.exists(out_path):  # idempotent (X_prepare:54-55)
        return None

    duration = [round(float(t), 3) for t in clip_duration(data["timestamp"])]
    window = [
        t for t in duration if data["start_sec"] <= t <= data["end_sec"]
    ]
    images_dir = f"{data_dir}/images/{ds}/{uid}/{fname}"
    frames, times = [], []
    for t in window:
        f = os.path.join(images_dir, f"{t}.jpg")
        if os.path.exists(f):
            frames.append(np.asarray(Image.open(f)))
            times.append(t)
    if not frames:
        return None

    results = {}
    for i, t in enumerate(times):
        nxt = frames[min(i + 1, len(frames) - 1)]
        o_bboxes, h_bboxes = detect_pair(detector, frames[i], nxt)
        results[t] = {"obj-bbox": o_bboxes, "hand-bbox": h_bboxes}

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(results, f)
    return out_path


def run(args, detector=None) -> int:
    if detector is None:
        detector = build_hod(
            getattr(args, "hod", "heuristic"),
            getattr(args, "hod_checkpoint", None),
        )
    infos_path = os.path.join(args.data_dir, "infos.json")
    if os.path.exists(infos_path):
        all_data = read_json(infos_path)
    else:
        all_data = [read_json(f) for f in list_stage_files(args.data_dir, "infos")]
    all_data = shard_files(
        all_data,
        start_index=getattr(args, "start_index", 0),
        end_index=getattr(args, "end_index", -1),
    )
    n = 0
    for data in all_data:
        if process_candidate(data, args.data_dir, detector):
            n += 1
    print(f"HOD detections written for {n} candidates")
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument(
        "--hod", default="heuristic", choices=("heuristic", "trained"),
        help="detector backend: skin+motion heuristic or the trained "
        "Faster-RCNN (assets/hod_synthetic.npz)",
    )
    p.add_argument("--hod_checkpoint", default=None)
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=-1)
    run(p.parse_args())


if __name__ == "__main__":
    main()
