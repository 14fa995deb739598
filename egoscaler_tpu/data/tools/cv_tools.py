"""CV utilities: frustum crop, homography chaining, depth alignment,
mask-selection heuristics, IoU, image validity.

Rebuild of egoscaler/data/tools/cv_tools.py.  The per-point python loops
of the reference (frustum `judge`, nearest-mask searches) are
vectorized; cv2 is used only for perspective warps.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def mask_from_hod(hod_res: Dict, height: int, width: int) -> np.ndarray:
    """Zero-out hand/object boxes (cv_tools.py:24-37); 1 = static."""
    mask = np.ones((height, width))
    for h_bbox in hod_res.get("hand-bbox", []):
        b = h_bbox[:4]
        mask[b[1]: b[3], b[0]: b[2]] = 0
    for o_bbox in hod_res.get("obj-bbox", []):
        mask[o_bbox[1]: o_bbox[3], o_bbox[0]: o_bbox[2]] = 0
    return mask


def frustum_crop(
    points_world: np.ndarray,
    corner_rays_device: np.ndarray,  # (4, 3) rays of the image corners
    r_world_device: np.ndarray,
    t_world_device: np.ndarray,
) -> np.ndarray:
    """Vectorized view-frustum test (cv_tools.py:12-64): keep world
    points inside the 4 planes spanned by the corner rays.

    Corner order: (0,0), (0,W), (H,0), (H,W) — plane normals via the
    reference's cross-product pairs and sign convention.
    """
    r1, r2, r3, r4 = corner_rays_device
    n1 = r_world_device @ np.cross(r1, r2)
    n2 = r_world_device @ np.cross(r1, r3)
    n3 = r_world_device @ np.cross(r3, r4)
    n4 = r_world_device @ np.cross(r2, r4)
    rel = points_world - t_world_device
    v1 = rel @ n1
    v2 = rel @ n2
    v3 = rel @ n3
    v4 = rel @ n4
    keep = (v1 < 0) & (v2 > 0) & (v3 > 0) & (v4 < 0)
    return points_world[keep]


def multiply_homo(
    homographies: Dict, t1: float, t2: float
) -> Optional[np.ndarray]:
    """Chain per-frame homographies into t2 -> t1 (cv_tools.py:66-101),
    preserving the reference's None-skipping and boundary quirks."""
    global_h = None
    if t1 == t2:
        return np.eye(3)
    for t in homographies:
        h = homographies[t]
        tf = float(t)
        if h is not None:
            h = np.array(h)
        if tf == t1:
            if h is None:
                return None
            global_h = h
        elif t1 < tf < t2:
            if h is None:
                continue
            global_h = h if global_h is None else global_h @ h
        elif tf >= t2:
            if h is not None and global_h is None:
                global_h = h
            break
    return global_h


def depth_alignment(
    image: np.ndarray,
    obs_depth: np.ndarray,
    depth: np.ndarray,
    obs_mask: np.ndarray,
    mask: np.ndarray,
    homo: np.ndarray,
    size: Tuple[int, int] = (1408, 1408),
    outlier_thresh: float = 1.5,
) -> float:
    """Mean depth offset between the warped frame and the observation
    (cv_tools.py:103-121)."""
    import cv2

    bin_image = image.sum(axis=2).astype(bool)
    depth = depth * bin_image
    obs_depth = obs_depth * bin_image
    depth = cv2.warpPerspective(depth, homo, size)
    mask = cv2.warpPerspective(mask.astype(float), homo, size)
    common = obs_mask * mask * bin_image
    nz = common.nonzero()
    diff = obs_depth[nz] - depth[nz]
    diff = np.where(np.abs(diff) > outlier_thresh, 0, diff)
    return float(diff.mean()) if diff.size else 0.0


def _mask_centers(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) -> (N, 2) (mean_y, mean_x) of each mask."""
    centers = []
    for m in masks:
        pts = np.argwhere(m)
        centers.append(pts.mean(axis=0) if len(pts) else np.zeros(2))
    return np.stack(centers)


def active_hand(obj_masks: np.ndarray, obj_region: np.ndarray) -> np.ndarray:
    """Nearest hand mask to the object center (cv_tools.py:123-138)."""
    obj_c = np.argwhere(obj_region).mean(axis=0)
    centers = _mask_centers(np.asarray(obj_masks))
    d = np.linalg.norm(centers - obj_c, axis=1)
    return np.asarray(obj_masks)[int(np.argmin(d))]


def get_mask_from_narr(
    masks: np.ndarray, left_or_right: str, width: int, height: int
) -> Optional[np.ndarray]:
    """Pick the mask nearest the narrated hand side (cv_tools.py:140-166,
    including its (y, x)-center vs (width, height)-pivot convention)."""
    if not len(masks):
        return None
    masks = masks.astype(np.float32)
    centers = _mask_centers(masks)  # (N, 2) = (mean_y, mean_x)
    if left_or_right == "right":
        pivot_h, pivot_v = width, height
    elif left_or_right == "left":
        pivot_h, pivot_v = 0, height
    else:
        return None
    weights = (pivot_h - centers[:, 0]) ** 2 + (pivot_v - centers[:, 1]) ** 2
    return masks[int(np.argmin(weights))]


def get_nearest_tool_mask(
    tool_masks: np.ndarray, object_mask: np.ndarray
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Nearest tool mask + its closest pixel to the object center
    (cv_tools.py:175-200)."""
    if not tool_masks.shape[0]:
        return None, None
    oc = np.argwhere(object_mask).mean(axis=0)
    centers = _mask_centers(tool_masks)
    idx = int(np.argmin(np.linalg.norm(centers - oc, axis=1)))
    pts = np.argwhere(tool_masks[idx])
    nearest = pts[np.argmin(np.linalg.norm(pts - oc, axis=1))]
    return tool_masks[idx].astype(np.float32), nearest


def iou(mask1: np.ndarray, mask2: np.ndarray) -> float:
    """(cv_tools.py:202-207 / pcm_tools.py:99-104)."""
    inter = np.logical_and(mask1, mask2).sum()
    union = np.logical_or(mask1, mask2).sum()
    return float(inter / union) if union else 0.0


def is_image_valid(image_file: str) -> bool:
    """(cv_tools.py:257-271)."""
    if not os.path.exists(image_file):
        return False
    try:
        from PIL import Image, UnidentifiedImageError

        with Image.open(image_file) as img:
            img.verify()
        return True
    except Exception:
        return False
