"""Farthest point sampling, TPU-native.

Reference: models/pointllm/pointllm/model/pointbert/misc.py:40-60 — an
O(npoint * N) iterative loop in torch.  Same algorithm as a `lax.scan`
over fixed `npoint` steps; distances are (B, N) elementwise updates (VPU).

The reference seeds FPS from a *random* point per batch
(misc.py:52 `torch.randint`).  We default to a seeded PRNG for
reproducibility and allow `deterministic=True` (start at point 0) for
bit-stable tests; the sampled set differs from torch run-to-run anyway.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def farthest_point_sampling(
    xyz: jax.Array,
    npoint: int,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, N, 3) points -> (B, npoint) int32 indices of FPS centers."""
    b, n, _ = xyz.shape
    if key is None:
        start = jnp.zeros((b,), jnp.int32)
    else:
        start = jax.random.randint(key, (b,), 0, n, jnp.int32)

    def step(carry, _):
        distance, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # (B, N)
        distance = jnp.minimum(distance, dist)
        next_farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return (distance, next_farthest), farthest

    init = (jnp.full((b, n), 1e10, xyz.dtype), start)
    _, idx = jax.lax.scan(step, init, None, length=npoint)
    return jnp.swapaxes(idx, 0, 1)  # (B, npoint)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """(B, N, C) gathered at (B, S) -> (B, S, C) (misc.py index_points)."""
    return jnp.take_along_axis(
        points, idx[..., None].astype(jnp.int32), axis=1
    )
