"""Trajectory visualization: offline renders without Open3D.

Rebuild of vis/video.py (orbit-camera MP4 of the colored point cloud +
OBB trajectory), vis/linemesh.py (line segments for box edges), and
vis/interactive.py's scene assembly — on a software point-splat renderer
(numpy/cv2) so it runs headless on TPU hosts.

Accepts both the current pickle schema {init_bbox, traj_quat,
traj_rotvec} and the legacy {'traj'} key of the demo assets
(SURVEY.md §8.4: vis/video.py:97 predates the rename).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from egoscaler_tpu.geometry.rotations import matrix_from_quat

# OBB corner connectivity for the 8-corner layout of geometry/obb.py
# (Open3D get_box_points order)
BOX_EDGES = (
    (0, 1), (0, 2), (0, 3), (1, 6), (1, 7), (2, 5), (2, 7),
    (3, 5), (3, 6), (4, 5), (4, 6), (4, 7),
)


def load_trajectory(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        traj = pickle.load(f)
    if "traj_quat" not in traj and "traj" in traj:  # legacy demo pickle
        traj = dict(traj, traj_quat=np.asarray(traj["traj"]))
    return traj


def _look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0, -1.0, 0])):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / (np.linalg.norm(right) + 1e-9)
    true_up = np.cross(right, fwd)
    r = np.stack([right, true_up, fwd])
    t = -r @ eye
    return r, t


def splat_points(
    points: np.ndarray,
    colors: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
    size: int = 640,
    focal: float = 500.0,
    point_px: int = 1,
) -> np.ndarray:
    """Z-buffered point splatting to an RGB image."""
    cam = points @ r.T + t
    z = cam[:, 2]
    ok = z > 0.05
    u = (focal * cam[:, 0] / z + size / 2).astype(int)
    v = (focal * cam[:, 1] / z + size / 2).astype(int)
    ok &= (u >= 0) & (u < size) & (v >= 0) & (v < size)
    img = np.zeros((size, size, 3), np.float32)
    zbuf = np.full((size, size), np.inf, np.float32)
    idx = np.nonzero(ok)[0][np.argsort(-z[ok])]
    for i in idx:
        for dy in range(-point_px, point_px + 1):
            for dx in range(-point_px, point_px + 1):
                yy, xx = v[i] + dy, u[i] + dx
                if 0 <= yy < size and 0 <= xx < size and z[i] < zbuf[yy, xx]:
                    zbuf[yy, xx] = z[i]
                    img[yy, xx] = colors[i]
    return (img * 255).astype(np.uint8)


def draw_line(img, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    for s in np.linspace(0, 1, n * 2):
        x = int(p0[0] + (p1[0] - p0[0]) * s)
        y = int(p0[1] + (p1[1] - p0[1]) * s)
        if 0 <= y < img.shape[0] - 1 and 0 <= x < img.shape[1] - 1:
            img[y: y + 2, x: x + 2] = color
    return img


def draw_box(img, corners, r, t, focal, color=(255, 40, 40)):
    cam = corners @ r.T + t
    z = cam[:, 2].clip(0.05)
    size = img.shape[0]
    uv = np.stack(
        [focal * cam[:, 0] / z + size / 2, focal * cam[:, 1] / z + size / 2],
        axis=1,
    ).astype(int)
    for a, b in BOX_EDGES:
        draw_line(img, uv[a], uv[b], color)
    return img


def render_trajectory_frames(
    points: np.ndarray,
    colors: np.ndarray,
    traj: Dict[str, np.ndarray],
    num_orbit: int = 0,
    size: int = 640,
    focal: float = 500.0,
    stride: int = 1,
) -> Sequence[np.ndarray]:
    """Per-waypoint frames: scene + transformed OBB + path so far
    (vis/video.py:136-189)."""
    traj_quat = np.asarray(traj["traj_quat"])
    bbox = np.asarray(traj["init_bbox"])
    center = points.mean(axis=0)
    frames = []
    path_px = []
    for wi in range(0, len(traj_quat), stride):
        wp = traj_quat[wi]
        pos, quat = wp[:3], wp[3:7]
        rot = np.asarray(matrix_from_quat(quat))
        corners = bbox @ rot.T + pos

        ang = 2 * np.pi * wi / max(num_orbit, len(traj_quat)) if num_orbit else 0.3
        eye = center + np.array(
            [1.6 * np.sin(ang), -0.6, -1.6 * np.cos(ang)]
        )
        r, t = _look_at(eye, center)
        img = splat_points(points, colors, r, t, size, focal)
        img = draw_box(img, corners, r, t, focal)
        # path trace
        cam = traj_quat[: wi + 1, :3] @ r.T + t
        z = cam[:, 2].clip(0.05)
        uv = np.stack(
            [focal * cam[:, 0] / z + size / 2,
             focal * cam[:, 1] / z + size / 2], axis=1
        ).astype(int)
        for a, b in zip(uv[:-1], uv[1:]):
            draw_line(img, a, b, (60, 220, 90))
        frames.append(img)
    return frames


def write_video(frames: Sequence[np.ndarray], path: str, fps: int = 10):
    """MP4 writer (moviepy replaced by cv2)."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        vw.write(f[..., ::-1])  # RGB -> BGR
    vw.release()


def render_demo(
    demo_dir: str,
    out_path: str = "visualization_video.mp4",
    focal_len: float = 605.343,
    principal_point: float = 703.5,
    d_thres: float = 5.0,
    size: int = 480,
):
    """vis/video.py main() equivalent over assets/demo-layout inputs:
    {image.jpg, depth.npy, trajectory.pkl, text.txt}."""
    import jax.numpy as jnp
    from PIL import Image

    from egoscaler_tpu.geometry.camera import get_points_colors

    image = np.asarray(Image.open(os.path.join(demo_dir, "image.jpg")))
    depth = np.load(os.path.join(demo_dir, "depth.npy"))
    traj = load_trajectory(os.path.join(demo_dir, "trajectory.pkl"))
    rgbd = np.concatenate(
        [image.astype(np.float32), depth[..., None]], axis=-1
    )
    pts, cols, valid = get_points_colors(
        jnp.asarray(rgbd), focal_len, focal_len, principal_point,
        d_thres=d_thres,
    )
    v = np.asarray(valid)
    pts = np.asarray(pts)[v]
    cols = np.asarray(cols)[v]
    # subsample for speed
    if len(pts) > 150_000:
        sel = np.random.default_rng(0).choice(len(pts), 150_000, replace=False)
        pts, cols = pts[sel], cols[sel]
    frames = render_trajectory_frames(pts, cols, traj, size=size)
    write_video(frames, out_path)
    return out_path
