"""Oriented bounding box + statistical outlier removal in fixed-shape JAX.

Reference: egoscaler/data/tools/pcm_tools.py:106-123 `minimum_3Dbox`, which
calls Open3D's `remove_statistical_outlier(nb_neighbors=20, std_ratio=2.0)`
and `get_oriented_bounding_box()` (C++).  We reimplement:

* statistical outlier removal as a masked kNN mean-distance test
  (identical definition to Open3D's StatisticalOutlierRemoval);
* the OBB as PCA over the inlier points (Open3D's OBB is PCA over the
  convex hull; for the small near-isotropic track clouds this pipeline
  feeds, PCA-over-points is a tolerance-level approximation that avoids a
  data-dependent-shape hull — SURVEY.md §2.3 "OBB via PCA").

The 8 corner vertices are emitted in Open3D's `get_box_points` order so
downstream consumers (vis/, pickle schema) see the same layout.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .jacobi import jacobi_eigh

_BIG = 1e10


def _masked_knn_mean_dist(
    points: jax.Array, mask: jax.Array, k: int
) -> jax.Array:
    """Mean distance of each point to its k nearest valid neighbors."""
    d2 = -2.0 * jnp.matmul(
        points, points.T, precision=jax.lax.Precision.HIGHEST
    )
    sq = jnp.sum(points * points, axis=-1)
    d2 = jnp.maximum(d2 + sq[:, None] + sq[None, :], 0.0)
    n = points.shape[0]
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye | ~mask[None, :], _BIG, d2)
    # top-k smallest distances
    neg_top, _ = jax.lax.top_k(-d2, k)
    dists = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    invalid = (-neg_top) >= _BIG * 0.5
    w = (~invalid).astype(points.dtype)
    return jnp.sum(dists * w, axis=-1) / jnp.sum(w, axis=-1).clip(1.0)


def statistical_outlier_mask(
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    nb_neighbors: int = 20,
    std_ratio: float = 2.0,
) -> jax.Array:
    """Open3D remove_statistical_outlier equivalent: keep points whose mean
    kNN distance is below mean + std_ratio * std of all valid points."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    k = min(nb_neighbors, n - 1)
    mean_d = _masked_knn_mean_dist(points, mask, k)
    w = mask.astype(points.dtype)
    cnt = jnp.sum(w).clip(1.0)
    mu = jnp.sum(mean_d * w) / cnt
    var = jnp.sum(w * (mean_d - mu) ** 2) / cnt
    # Open3D uses the unbiased estimator; correct with n/(n-1)
    var = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
    thresh = mu + std_ratio * jnp.sqrt(var)
    return mask & (mean_d <= thresh)


# Open3D OrientedBoundingBox.get_box_points() corner order, as sign
# combinations of the half-extents along the three principal axes:
#   0:(-,-,-) 1:(+,-,-) 2:(-,+,-) 3:(-,-,+) 4:(+,+,+) 5:(-,+,+) 6:(+,-,+) 7:(+,+,-)
_CORNER_SIGNS = jnp.array(
    [
        [-1, -1, -1],
        [+1, -1, -1],
        [-1, +1, -1],
        [-1, -1, +1],
        [+1, +1, +1],
        [-1, +1, +1],
        [+1, -1, +1],
        [+1, +1, -1],
    ],
    dtype=jnp.float32,
)


def oriented_bounding_box(
    points: jax.Array, mask: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """PCA oriented bounding box of masked points.

    Returns (center (3,), rotation (3,3) columns = axes, extent (3,)).
    """
    if mask is None:
        mask = jnp.ones(points.shape[:1], dtype=bool)
    w = mask.astype(points.dtype)[:, None]
    cnt = jnp.sum(w).clip(1.0)
    mean = jnp.sum(points * w, axis=0) / cnt
    centered = (points - mean) * w
    cov = jnp.matmul(
        centered.T, centered, precision=jax.lax.Precision.HIGHEST
    ) / cnt
    evals, evecs = jacobi_eigh(cov)  # ascending; columns are axes
    # project points onto axes to get extents & true center
    proj = jnp.matmul(points - mean, evecs, precision=jax.lax.Precision.HIGHEST)
    pmin = jnp.min(jnp.where(mask[:, None], proj, _BIG), axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], proj, -_BIG), axis=0)
    extent = pmax - pmin
    center = mean + evecs @ ((pmax + pmin) / 2.0)
    return center, evecs, extent


def minimum_3dbox(
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    nb_neighbors: int = 20,
    std_ratio: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """8 OBB vertices after outlier removal (pcm_tools.py:106-123).

    Returns (vertices (8, 3), ok flag).  `ok` is False when fewer than 5
    valid points survive — the reference's bail-out (pcm_tools.py:107-109).
    """
    if mask is None:
        mask = jnp.ones(points.shape[:1], dtype=bool)
    inliers = statistical_outlier_mask(points, mask, nb_neighbors, std_ratio)
    ok = jnp.sum(inliers.astype(jnp.int32)) >= 5
    center, axes, extent = oriented_bounding_box(points, inliers)
    half = extent / 2.0
    corners = center + jnp.matmul(
        _CORNER_SIGNS * half, axes.T, precision=jax.lax.Precision.HIGHEST
    )
    return corners, ok
