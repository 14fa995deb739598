"""Kabsch / Umeyama rigid alignment.

Reference: egoscaler/data/tools/pcm_tools.py:125-158 `compute_rotation`
(SVD Kabsch with determinant sign fix).  We solve the same constrained
optimum — the proper rotation maximizing trace(R H) — via Horn's
closed-form quaternion method (max eigenvector of the 4x4 K matrix),
computed with a cyclic-Jacobi eigensolver.  This is mathematically
identical to SVD-Kabsch-with-det-fix but reaches f32 machine precision on
every XLA backend (the platform's iterative f32 SVD can err by ~1e-3).

Extended with masked-point support (fixed-shape padded track arrays) and
a full SE(3) variant used by the ICP/RANSAC estimators.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .jacobi import jacobi_eigh
from .rotations import matrix_from_quat


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(x, axis=-2)
    w = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * w, axis=-2) / jnp.sum(w, axis=-2).clip(1e-12)


def _horn_rotation_from_h(h: jax.Array) -> jax.Array:
    """Optimal proper rotation R with final ~= R @ initial from the 3x3
    correlation matrix H = sum_i initial_i final_i^T (outer products).

    Horn (1987): the optimal unit quaternion is the eigenvector of the
    symmetric 4x4 K matrix with the largest eigenvalue.
    """
    s11, s12, s13 = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    s21, s22, s23 = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    s31, s32, s33 = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]
    # quaternion order (w, x, y, z) in the K matrix
    k = jnp.stack(
        [
            jnp.stack([s11 + s22 + s33, s23 - s32, s31 - s13, s12 - s21], -1),
            jnp.stack([s23 - s32, s11 - s22 - s33, s12 + s21, s31 + s13], -1),
            jnp.stack([s31 - s13, s12 + s21, -s11 + s22 - s33, s23 + s32], -1),
            jnp.stack([s12 - s21, s31 + s13, s23 + s32, -s11 - s22 + s33], -1),
        ],
        axis=-2,
    )
    evals, evecs = jacobi_eigh(k)
    q_wxyz = evecs[..., :, -1]  # largest eigenvalue (ascending order)
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)
    return matrix_from_quat(q_xyzw)


def kabsch_rotation(
    initial_points: jax.Array,
    final_points: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Rotation R (3,3) aligning initial -> final: final ~= R @ initial.

    Same optimum as pcm_tools.py:125-158 (incl. the det sign fix).
    `mask` (N,) bool marks valid correspondences in padded arrays.
    """
    ci = _masked_mean(initial_points, mask)
    cf = _masked_mean(final_points, mask)
    pi = initial_points - ci[..., None, :]
    pf = final_points - cf[..., None, :]
    if mask is not None:
        w = mask.astype(pi.dtype)[..., None]
        pi = pi * w
        pf = pf * w
    h = jnp.matmul(
        jnp.swapaxes(pi, -1, -2), pf, precision=jax.lax.Precision.HIGHEST
    )  # H = sum_i a_i b_i^T
    return _horn_rotation_from_h(h)


def kabsch_se3(
    source: jax.Array,
    target: jax.Array,
    weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Weighted rigid transform (R, t) minimizing ||R @ s + t - tgt||^2.

    Used by the point-to-point ICP/RANSAC estimators (the Open3D
    TransformationEstimationPointToPoint equivalent, pcm_tools.py:39).
    """
    if weights is None:
        weights = jnp.ones(source.shape[:-1], source.dtype)
    w = weights[..., None]
    wsum = jnp.sum(weights, axis=-1)[..., None].clip(1e-12)
    cs = jnp.sum(source * w, axis=-2) / wsum
    ct = jnp.sum(target * w, axis=-2) / wsum
    ps = (source - cs[..., None, :]) * w
    pt = target - ct[..., None, :]
    h = jnp.matmul(
        jnp.swapaxes(ps, -1, -2), pt, precision=jax.lax.Precision.HIGHEST
    )
    r = _horn_rotation_from_h(h)
    t = ct - jnp.einsum("...ij,...j->...i", r, cs)
    return r, t
