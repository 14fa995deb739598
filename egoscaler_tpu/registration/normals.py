"""Normal estimation for masked point sets.

Open3D equivalent: `estimate_normals(KDTreeSearchParamHybrid(radius, 30))`
(pcm_tools.py:13): per-point covariance over hybrid neighbors, normal =
smallest eigenvector.  Eigenvectors come from the backend-robust Jacobi
solver (geometry/jacobi.py).  Normals are oriented toward the camera
origin (RGBD clouds live in the camera frame; Open3D leaves orientation
solver-arbitrary, which FPFH consumes — camera-orientation is the
deterministic choice for sensor data).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from egoscaler_tpu.geometry.jacobi import jacobi_eigh
from egoscaler_tpu.registration.neighbors import hybrid_knn


def estimate_normals(
    points: jax.Array,
    mask: jax.Array,
    radius: float,
    max_nn: int = 30,
    neighbors=None,
) -> jax.Array:
    """(M, 3) + mask -> (M, 3) unit normals (garbage on masked rows).

    `neighbors` is an optional precomputed self-inclusive
    (indices, dist2) table (neighbors.knn_table) with >= max_nn columns
    — prepare_cloud shares one table between normals and FPFH."""
    if neighbors is not None:
        idx, dist2 = neighbors
        idx = idx[:, :max_nn]
        nvalid = (dist2[:, :max_nn] <= radius * radius) & mask[:, None]
    else:
        idx, nvalid = hybrid_knn(points, mask, radius, max_nn)
    neigh = points[idx]  # (M, K, 3)
    w = nvalid.astype(points.dtype)[..., None]
    cnt = jnp.sum(w, axis=1).clip(1.0)
    mean = jnp.sum(neigh * w, axis=1) / cnt
    centered = (neigh - mean[:, None, :]) * w
    cov = jnp.einsum(
        "mki,mkj->mij", centered, centered,
        precision=jax.lax.Precision.HIGHEST,
    ) / cnt[..., None]
    _, evecs = jacobi_eigh(cov)
    normal = evecs[..., :, 0]  # smallest eigenvalue (ascending)
    # orient toward the camera origin: n . (-p) >= 0
    flip = jnp.sum(normal * points, axis=-1) > 0
    return jnp.where(flip[:, None], -normal, normal)
