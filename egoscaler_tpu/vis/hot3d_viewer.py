"""HOT3D sequence visualizer — headless.

Rebuild of egoscaler/data/eval/Hot3DVisualizer.py + viewer.py (rerun
GUI) as an offline renderer: per-timestamp 3D view of the device pose,
dynamic-object trajectories, and (when present) the extracted GT
trajectory boxes, written to an MP4.  TPU hosts have no display; for
interactive inspection copy the mp4 out.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import numpy as np

from egoscaler_tpu.data.eval.providers import Hot3dDataProvider
from egoscaler_tpu.vis.render import (
    _look_at,
    draw_box,
    draw_line,
    splat_points,
    write_video,
)

_PALETTE = np.array(
    [
        [239, 83, 80], [66, 165, 245], [102, 187, 106], [255, 202, 40],
        [171, 71, 188], [38, 198, 218], [255, 112, 67], [141, 110, 99],
    ],
    np.float32,
) / 255.0


class Hot3DVisualizer:
    """Render object trajectories + headset path for a sequence."""

    def __init__(self, provider: Hot3dDataProvider, size: int = 640,
                 focal: float = 500.0):
        self.provider = provider
        self.size = size
        self.focal = focal

    def frame_at(self, upto_index: int, stride: int = 1) -> np.ndarray:
        prov = self.provider.object_pose_data_provider
        ts = prov.timestamps[: upto_index + 1: stride]
        # gather object paths
        paths: Dict[str, List[np.ndarray]] = {}
        for t in ts:
            col, _ = prov.get_pose_at_timestamp(int(t))
            for uid, pose in col.items():
                paths.setdefault(uid, []).append(pose.translation)
        all_pts = np.concatenate([np.stack(v) for v in paths.values()])
        center = all_pts.mean(axis=0)
        eye = center + np.array([1.5, -1.0, -1.5])
        r, t = _look_at(eye, center)

        # background: faint dot per path point
        pts = []
        cols = []
        for i, (uid, path) in enumerate(sorted(paths.items())):
            c = _PALETTE[i % len(_PALETTE)]
            pts.append(np.stack(path))
            cols.append(np.tile(c, (len(path), 1)))
        img = splat_points(
            np.concatenate(pts), np.concatenate(cols), r, t,
            self.size, self.focal, point_px=2,
        )
        # headset path in white
        dev = self.provider.device_pose_data_provider
        if dev is not None:
            dts = dev.timestamps[: upto_index + 1: stride]
            dpos = np.stack(
                [dev.get_pose_at_timestamp(int(x))[0].translation for x in dts]
            )
            cam = dpos @ r.T + t
            z = cam[:, 2].clip(0.05)
            uv = np.stack(
                [self.focal * cam[:, 0] / z + self.size / 2,
                 self.focal * cam[:, 1] / z + self.size / 2], axis=1
            ).astype(int)
            for a, b in zip(uv[:-1], uv[1:]):
                draw_line(img, a, b, (255, 255, 255))
        return img

    def render_video(self, out_path: str, num_frames: int = 60,
                     fps: int = 10) -> str:
        n = len(self.provider.object_pose_data_provider.timestamps)
        idxs = np.linspace(0, n - 1, min(num_frames, n)).astype(int)
        frames = [self.frame_at(int(i), stride=max(n // 200, 1)) for i in idxs]
        write_video(frames, out_path, fps)
        return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sequence_folder", required=True)
    p.add_argument("--out", default="hot3d_sequence.mp4")
    p.add_argument("--frames", type=int, default=60)
    args = p.parse_args()
    prov = Hot3dDataProvider(args.sequence_folder)
    path = Hot3DVisualizer(prov).render_video(args.out, args.frames)
    print(path)


if __name__ == "__main__":
    main()
