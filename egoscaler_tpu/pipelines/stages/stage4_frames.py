"""Stage 4: per-clip frame extraction.

Rebuild of egoscaler/data/train/4_get_image.py: group infos by video,
dump the 80-frame (+/-2 s at 20 fps) JPEG clip per candidate.  VRS
sources go through the projectaria adapter (host-side IO); mp4 sources
(ego4d / epic-kitchens) decode with cv2.  Extraction is parallel over a
thread pool (IO-bound) and idempotent per frame file.
"""
from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List

import numpy as np

from egoscaler_tpu.data.adapters import egoexo4d
from egoscaler_tpu.pipelines.stages.common import (
    list_stage_files,
    read_json,
)


def extract_mp4_clip(video_path: str, data: Dict, save_path: str) -> None:
    """mp4 -> frame JPEGs for the clip window (cv2 path)."""
    import cv2

    duration = egoexo4d.clip_duration(data["timestamp"])
    os.makedirs(save_path, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    try:
        for _t in duration:
            out = os.path.join(save_path, f"{round(float(_t), 3)}.jpg")
            if os.path.exists(out):
                continue
            cap.set(cv2.CAP_PROP_POS_MSEC, max(float(_t), 0.0) * 1000.0)
            ok, frame = cap.read()
            if not ok:
                continue
            cv2.imwrite(out, frame)
    finally:
        cap.release()


def process_video(video_uid: str, infos: List[Dict], args) -> None:
    save_root = os.path.join(
        args.save_dir, "images", infos[0]["dataset_name"], video_uid
    )
    for data in infos:
        save_path = os.path.join(save_root, data["file_name"])
        if args.source == "vrs":
            vrs = os.path.join(args.root_dir, "takes",
                               data.get("take_name") or video_uid,
                               f"{data.get('vrs_file_name')}.vrs")
            egoexo4d.extract_images(vrs, data, save_path)
        else:
            mp4 = os.path.join(args.root_dir, f"{video_uid}.mp4")
            extract_mp4_clip(mp4, data, save_path)


def run(args) -> None:
    infos = [read_json(f) for f in list_stage_files(args.save_dir, "infos")]
    by_video: Dict[str, List[Dict]] = {}
    for d in infos:
        by_video.setdefault(d["video_uid"], []).append(d)
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        futures = [
            ex.submit(process_video, uid, lst, args)
            for uid, lst in by_video.items()
        ]
        for f in futures:
            f.result()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--source", default="vrs", choices=["vrs", "mp4"])
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()
    run(args)


if __name__ == "__main__":
    main()
