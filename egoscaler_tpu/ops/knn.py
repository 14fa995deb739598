"""k-nearest-neighbor grouping via batched distance matmul + top_k.

Reference: pointbert/dvae.py:107-140 (`knn_point`, `square_distance`).
The pairwise distance is one big MXU matmul: ||a-b||^2 = |a|^2 + |b|^2
- 2 a.b — exactly how the reference computes it, which maps perfectly
onto the TPU (S x N matmul), followed by top_k on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """(B, N, C), (B, M, C) -> (B, N, M) squared euclidean distances."""
    d = -2.0 * jnp.einsum(
        "bnc,bmc->bnm", src, dst, preferred_element_type=jnp.float32
    )
    d = d + jnp.sum(src.astype(jnp.float32) ** 2, -1)[..., :, None]
    d = d + jnp.sum(dst.astype(jnp.float32) ** 2, -1)[..., None, :]
    return d


def knn_indices(xyz: jax.Array, query: jax.Array, k: int) -> jax.Array:
    """Indices (B, S, k) of the k nearest points in `xyz` for each query.

    Matches dvae.py:107-118 `knn_point` (top-k smallest distances).
    """
    d = square_distance(query, xyz)  # (B, S, N)
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def gather_groups(points: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N, C) gathered at (B, S, K) -> (B, S, K, C)."""
    b, n, c = points.shape
    _, s, k = idx.shape
    flat = jnp.take_along_axis(
        points, idx.reshape(b, s * k)[..., None].astype(jnp.int32), axis=1
    )  # (B, S*K, C)
    return flat.reshape(b, s, k, c)
