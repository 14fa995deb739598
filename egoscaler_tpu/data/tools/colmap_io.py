"""COLMAP model IO: cameras / images / points3D, binary + text.

Rebuild of egoscaler/data/tools/read_write_model.py (the vendored COLMAP
scripts): read/write sparse reconstructions and the quaternion helper.
Numpy-only; formats follow the COLMAP binary spec
(https://colmap.github.io/format.html).
"""
from __future__ import annotations

import dataclasses
import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_NAME_TO_ID = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclasses.dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclasses.dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray   # (4,) w x y z
    tvec: np.ndarray   # (3,)
    camera_id: int
    name: str
    xys: np.ndarray        # (N, 2)
    point3d_ids: np.ndarray  # (N,)


@dataclasses.dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2d_idxs: np.ndarray


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion -> rotation matrix
    (read_write_model.py:524)."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(r: np.ndarray) -> np.ndarray:
    from egoscaler_tpu.geometry.rotations import quat_from_matrix
    import jax.numpy as jnp

    xyzw = np.asarray(quat_from_matrix(jnp.asarray(r.astype(np.float32))))
    return np.array([xyzw[3], xyzw[0], xyzw[1], xyzw[2]])


def _read(f, fmt):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_binary(path: str) -> Dict[int, Camera]:
    cameras = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{n_params}d"))
            cameras[cam_id] = Camera(cam_id, name, width, height, params)
    return cameras


def read_images_binary(path: str) -> Dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            vals = _read(f, "<idddddddi")
            img_id = vals[0]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            cam_id = vals[8]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, "<Q")
            data = _read(f, f"<{'ddq' * n_pts}")
            xys = np.array(data).reshape(n_pts, 3)[:, :2] if n_pts else np.zeros((0, 2))
            ids = (
                np.array(data).reshape(n_pts, 3)[:, 2].astype(np.int64)
                if n_pts else np.zeros((0,), np.int64)
            )
            images[img_id] = ColmapImage(
                img_id, qvec, tvec, cam_id, name.decode(), xys, ids
            )
    return images


def read_points3d_binary(path: str) -> Dict[int, Point3D]:
    points = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            vals = _read(f, "<QdddBBBd")
            pid = vals[0]
            xyz = np.array(vals[1:4])
            rgb = np.array(vals[4:7], np.uint8)
            error = vals[7]
            (track_len,) = _read(f, "<Q")
            track = np.array(_read(f, f"<{'ii' * track_len}")).reshape(track_len, 2)
            points[pid] = Point3D(
                pid, xyz, rgb, error, track[:, 0], track[:, 1]
            )
    return points


def read_cameras_text(path: str) -> Dict[int, Camera]:
    cameras = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id = int(parts[0])
            cameras[cam_id] = Camera(
                cam_id, parts[1], int(parts[2]), int(parts[3]),
                np.array([float(p) for p in parts[4:]]),
            )
    return cameras


def read_model(
    path: str, ext: Optional[str] = None
) -> Tuple[Dict, Dict, Dict]:
    """(cameras, images, points3D) — read_write_model.py:490 dispatch."""
    if ext is None:
        ext = ".bin" if os.path.exists(os.path.join(path, "cameras.bin")) else ".txt"
    if ext == ".bin":
        return (
            read_cameras_binary(os.path.join(path, "cameras.bin")),
            read_images_binary(os.path.join(path, "images.bin")),
            read_points3d_binary(os.path.join(path, "points3D.bin")),
        )
    cameras = read_cameras_text(os.path.join(path, "cameras.txt"))
    images: Dict[int, ColmapImage] = {}
    img_path = os.path.join(path, "images.txt")
    if os.path.exists(img_path):
        with open(img_path) as f:
            lines = [
                l.strip() for l in f
                if l.strip() and not l.startswith("#")
            ]
        for meta, pts in zip(lines[0::2], lines[1::2]):
            p = meta.split()
            img_id = int(p[0])
            qvec = np.array([float(x) for x in p[1:5]])
            tvec = np.array([float(x) for x in p[5:8]])
            cam_id = int(p[8])
            name = p[9]
            vals = pts.split()
            arr = (
                np.array([float(x) for x in vals]).reshape(-1, 3)
                if vals else np.zeros((0, 3))
            )
            images[img_id] = ColmapImage(
                img_id, qvec, tvec, cam_id, name, arr[:, :2],
                arr[:, 2].astype(np.int64),
            )
    points: Dict[int, Point3D] = {}
    pts_path = os.path.join(path, "points3D.txt")
    if os.path.exists(pts_path):
        with open(pts_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split()
                pid = int(p[0])
                track = np.array([int(x) for x in p[8:]]).reshape(-1, 2)
                points[pid] = Point3D(
                    pid, np.array([float(x) for x in p[1:4]]),
                    np.array([int(x) for x in p[4:7]], np.uint8),
                    float(p[7]), track[:, 0], track[:, 1],
                )
    return cameras, images, points


def write_cameras_binary(cameras: Dict[int, Camera], path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            mid = MODEL_NAME_TO_ID[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, mid, cam.width, cam.height))
            f.write(struct.pack(f"<{len(cam.params)}d", *cam.params))


def write_images_binary(images: Dict[int, ColmapImage], path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack(
                "<idddddddi", im.id, *im.qvec, *im.tvec, im.camera_id
            ))
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(im.xys)))
            for xy, pid in zip(im.xys, im.point3d_ids):
                f.write(struct.pack("<ddq", xy[0], xy[1], int(pid)))
