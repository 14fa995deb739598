"""Pinhole camera model: projection and back-projection.

TPU-native counterpart of the reference's numpy back-projection
(egoscaler/data/tools/pcm_tools.py:68-96 `get_points_colors`).  Instead of
boolean fancy-indexing (dynamic shapes), we return fixed-shape point arrays
plus a validity mask, so downstream registration/encoding stays jittable.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def backproject_depth(
    depth: jax.Array,
    focal_len_x: float,
    focal_len_y: float,
    principal_point: float,
) -> jax.Array:
    """Depth map (H, W) -> camera-frame points (H, W, 3).

    Matches pcm_tools.py:73-77: x = (u - pp) / fx * z, y = (v - pp) / fy * z.
    """
    h, w = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = (u - principal_point) / focal_len_x * depth
    y = (v - principal_point) / focal_len_y * depth
    return jnp.stack([x, y, depth], axis=-1)


def backproject_points(
    uv: jax.Array,
    z: jax.Array,
    focal_len_x: float,
    focal_len_y: float,
    principal_point: float,
) -> jax.Array:
    """Pixel coords (..., 2) + depth (...,) -> camera points (..., 3).

    Matches the track back-projection of 7_get_object_trajectory.py:226-230.
    """
    x = (uv[..., 0] - principal_point) / focal_len_x * z
    y = (uv[..., 1] - principal_point) / focal_len_y * z
    return jnp.stack([x, y, z], axis=-1)


def project_points(
    points: jax.Array,
    focal_len_x: float,
    focal_len_y: float,
    principal_point: float,
) -> jax.Array:
    """Camera points (..., 3) -> pixel coords (..., 2)."""
    z = points[..., 2]
    u = focal_len_x * points[..., 0] / z + principal_point
    v = focal_len_y * points[..., 1] / z + principal_point
    return jnp.stack([u, v], axis=-1)


def get_points_colors(
    rgbd: jax.Array,
    focal_len_x: float,
    focal_len_y: float,
    principal_point: float,
    bbox_mask: Optional[jax.Array] = None,
    d_thres: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Back-project an RGBD image to a colored point cloud with validity mask.

    Reference semantics (pcm_tools.py:68-96):
      * colors = rgb / 255
      * a pixel is valid iff all three color channels are non-zero
      * pixels inside any excluded bbox are invalid (moving objects masked out)
      * if `d_thres` is given, depth must be < d_thres

    Args:
      rgbd: (H, W, 4) with channels [r, g, b, depth]; rgb in [0, 255].
      bbox_mask: optional (H, W) bool, True where pixels are EXCLUDED
        (the interior of object/person/hand boxes).
      d_thres: optional metric depth cutoff.

    Returns:
      points: (H*W, 3) camera-frame points (invalid rows left in place),
      colors: (H*W, 3) in [0, 1],
      valid:  (H*W,) bool mask.

    Unlike the reference we do NOT compress valid rows to the front — the
    caller consumes (points, mask) pairs, keeping shapes static for XLA.
    """
    image = rgbd[..., :3]
    z = rgbd[..., 3]
    points = backproject_depth(z, focal_len_x, focal_len_y, principal_point)
    colors = image / 255.0

    valid = jnp.all(image != 0, axis=-1)
    if bbox_mask is not None:
        valid = valid & ~bbox_mask
    if d_thres is not None:
        valid = valid & (z < d_thres)

    h, w = z.shape
    return points.reshape(h * w, 3), colors.reshape(h * w, 3), valid.reshape(h * w)


def bbox_exclusion_mask(
    height: int,
    width: int,
    boxes: jax.Array,
    num_valid: jax.Array,
) -> jax.Array:
    """Rasterize (N, 4) [xmin, ymin, xmax, ymax] int boxes into a bool mask.

    True inside any of the first `num_valid` boxes.  Fixed-shape replacement
    for the reference's per-box slice assignment (pcm_tools.py:81-83).
    """
    u = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    v = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)

    def one_box(box, idx):
        inside = (
            (u >= box[0]) & (u < box[2]) & (v >= box[1]) & (v < box[3])
        )
        return inside & (idx < num_valid)

    idxs = jnp.arange(boxes.shape[0])
    masks = jax.vmap(one_box)(boxes, idxs)
    return jnp.any(masks, axis=0)
