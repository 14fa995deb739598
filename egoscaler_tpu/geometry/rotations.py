"""Rotation conversions in pure JAX, scipy-compatible.

The reference uses `scipy.spatial.transform.Rotation` throughout
(7_get_object_trajectory.py:302,316-317; metrics.py:79-80).  All quaternions
here follow the scipy convention: (x, y, z, w), scalar last, and
`as_quat`-style sign (w >= 0 is NOT enforced by scipy; we match its
branch structure for bit-level parity on the matrix->quat path).

Everything is written for trailing-axis vectorization: inputs may have
arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of two xyzw quaternions (scipy `R1 * R2` order)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def matrix_from_quat(quat: jax.Array) -> jax.Array:
    """xyzw quaternion -> 3x3 rotation matrix (normalizes the input)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(_EPS)
    x, y, z, w = jnp.moveaxis(quat, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def quat_from_matrix(matrix: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> xyzw quaternion.

    Uses the Shepperd / scipy branch selection (largest diagonal pivot) so
    signs match `scipy.spatial.transform.Rotation.from_matrix().as_quat()`.
    """
    m = matrix
    diag = jnp.diagonal(m, axis1=-2, axis2=-1)  # (..., 3)
    trace = jnp.sum(diag, axis=-1)

    # Candidate quaternions for each pivot choice, computed branch-free.
    def _pivot(i):
        j, k = (i + 1) % 3, (i + 2) % 3
        q = jnp.zeros(m.shape[:-2] + (4,), m.dtype)
        t = 1.0 + diag[..., i] - diag[..., j] - diag[..., k]
        t = jnp.maximum(t, _EPS)
        s = jnp.sqrt(t)
        q = q.at[..., i].set(s)
        q = q.at[..., j].set((m[..., j, i] + m[..., i, j]) / s)
        q = q.at[..., k].set((m[..., k, i] + m[..., i, k]) / s)
        q = q.at[..., 3].set((m[..., k, j] - m[..., j, k]) / s)
        return q

    def _trace_branch():
        t = jnp.maximum(1.0 + trace, _EPS)
        s = jnp.sqrt(t)
        return jnp.stack(
            [
                (m[..., 2, 1] - m[..., 1, 2]) / s,
                (m[..., 0, 2] - m[..., 2, 0]) / s,
                (m[..., 1, 0] - m[..., 0, 1]) / s,
                s,
            ],
            axis=-1,
        )

    candidates = jnp.stack([_pivot(0), _pivot(1), _pivot(2), _trace_branch()], axis=-2)
    # scipy picks: if trace > diag.max() use trace branch, else argmax diag.
    choice = jnp.where(trace > jnp.max(diag, axis=-1), 3, jnp.argmax(diag, axis=-1))
    q = jnp.take_along_axis(
        candidates, choice[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    # scipy canonicalizes nothing here; but its algorithm yields w>=0 only on
    # the trace branch.  Match scipy exactly: no extra sign flip.
    return q


def quat_from_rotvec(rotvec: jax.Array) -> jax.Array:
    """Rotation vector (axis * angle) -> xyzw quaternion.

    Taylor-expanded near zero like scipy for numerical stability.
    """
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    small = angle < 1e-3
    angle2 = angle * angle
    # sin(a/2)/a: series = 1/2 - a^2/48 + a^4/3840
    scale_small = 0.5 - angle2 / 48.0 + angle2 * angle2 / 3840.0
    scale_big = jnp.sin(angle / 2.0) / jnp.where(small, 1.0, angle)
    scale = jnp.where(small, scale_small, scale_big)
    xyz = rotvec * scale
    w = jnp.cos(angle / 2.0)
    return jnp.concatenate([xyz, w], axis=-1)


def rotvec_from_quat(quat: jax.Array) -> jax.Array:
    """xyzw quaternion -> rotation vector, scipy-compatible (angle in [0, pi])."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(_EPS)
    # enforce w >= 0 so the angle lands in [0, pi] (scipy does this)
    quat = jnp.where(quat[..., 3:4] < 0, -quat, quat)
    xyz = quat[..., :3]
    w = quat[..., 3:4]
    norm_xyz = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm_xyz, w)
    small = angle < 1e-3
    angle2 = angle * angle
    # a / sin(a/2): series via scale = 2 + a^2/12 + 7a^4/2880
    scale_small = 2.0 + angle2 / 12.0 + 7.0 * angle2 * angle2 / 2880.0
    scale_big = angle / jnp.where(small, 1.0, jnp.sin(angle / 2.0)).clip(_EPS)
    scale = jnp.where(small, scale_small, scale_big)
    return xyz * scale


def matrix_from_rotvec(rotvec: jax.Array) -> jax.Array:
    return matrix_from_quat(quat_from_rotvec(rotvec))


def rotvec_from_matrix(matrix: jax.Array) -> jax.Array:
    return rotvec_from_quat(quat_from_matrix(matrix))


def quat_geodesic_distance(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """2*arccos(|<q1,q2>|): geodesic angle between two rotations.

    NOTE: the reference metric (metrics.py:82-84) omits the abs(); we keep
    a faithful variant in training.metrics and the correct one here.
    """
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))
