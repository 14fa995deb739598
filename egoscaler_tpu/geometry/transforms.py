"""SE(3) homogeneous-transform helpers (4x4 matrices), jittable."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def se3_from_rt(r: jax.Array, t: jax.Array) -> jax.Array:
    """(3,3) rotation + (3,) translation -> (4,4) homogeneous transform."""
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], r.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_apply(transform: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (4,4) transform to (..., N, 3) points (homogeneous divide).

    Matches 7_get_object_trajectory.py:293-295.
    """
    r = transform[..., :3, :3]
    t = transform[..., :3, 3]
    w_row = transform[..., 3, :3]
    w0 = transform[..., 3, 3]
    xyz = jnp.einsum(
        "...ij,...nj->...ni", r, points, precision=jax.lax.Precision.HIGHEST
    ) + t[..., None, :]
    w = jnp.einsum(
        "...j,...nj->...n", w_row, points, precision=jax.lax.Precision.HIGHEST
    ) + w0[..., None]
    return xyz / w[..., None]


def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b (apply b first, then a — standard matrix composition)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def se3_inverse(transform: jax.Array) -> jax.Array:
    r = transform[..., :3, :3]
    t = transform[..., :3, 3]
    rinv = jnp.swapaxes(r, -1, -2)
    tinv = -jnp.einsum(
        "...ij,...j->...i", rinv, t, precision=jax.lax.Precision.HIGHEST
    )
    return se3_from_rt(rinv, tinv)
