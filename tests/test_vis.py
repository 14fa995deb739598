"""Visualization renders: demo-layout assets -> mp4 + frame checks."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from egoscaler_tpu.vis.render import (
    load_trajectory,
    render_demo,
    render_trajectory_frames,
    splat_points,
    write_video,
)


def make_demo_assets(tmp_path, rng):
    demo = tmp_path / "demo"
    os.makedirs(demo, exist_ok=True)
    h = w = 64
    img = rng.integers(1, 255, (h, w, 3)).astype(np.uint8)
    Image.fromarray(img).save(demo / "image.jpg")
    np.save(demo / "depth.npy", rng.uniform(0.5, 3.0, (h, w)).astype(np.float32))
    traj_quat = np.zeros((5, 7), np.float32)
    traj_quat[:, 2] = 1.5
    traj_quat[:, 0] = np.linspace(0, 0.3, 5)
    traj_quat[:, 6] = 1.0
    bbox = rng.uniform(-0.05, 0.05, (8, 3)).astype(np.float32)
    with open(demo / "trajectory.pkl", "wb") as f:
        pickle.dump(
            {"init_bbox": bbox, "traj_quat": traj_quat,
             "traj_rotvec": np.zeros((5, 6), np.float32)}, f,
        )
    with open(demo / "text.txt", "w") as f:
        f.write("move the cup")
    return str(demo)


def test_legacy_traj_key(tmp_path, rng):
    p = tmp_path / "t.pkl"
    with open(p, "wb") as f:
        pickle.dump({"traj": np.zeros((3, 7)), "init_bbox": np.zeros((8, 3))}, f)
    traj = load_trajectory(str(p))
    assert "traj_quat" in traj  # SURVEY §8.4 defect handled


def test_splat_points_visible(rng):
    pts = rng.uniform(-0.5, 0.5, (2000, 3)).astype(np.float32)
    pts[:, 2] += 2.0
    cols = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    img = splat_points(pts, cols, np.eye(3), np.zeros(3), size=128, focal=100)
    assert img.shape == (128, 128, 3)
    assert (img > 0).any()


def test_render_demo_mp4(tmp_path, rng):
    demo = make_demo_assets(tmp_path, rng)
    out = str(tmp_path / "vis.mp4")
    path = render_demo(demo, out, focal_len=60.0, principal_point=31.5,
                       size=96)
    assert os.path.exists(path)
    assert os.path.getsize(path) > 1000
