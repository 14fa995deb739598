"""Closed-form solvers for tiny dense systems on TPU.

`jnp.linalg.solve` lowers to the `LuDecompositionBlock` custom call,
which serializes batched tiny systems on the scalar unit — profiled at
3.2 ms per 4096-batch of 3x3 solves in the colored-ICP gradient setup
(the single hottest op of the whole registration stage).  Cramer /
unrolled-Cholesky forms are pure VPU arithmetic and fuse with their
producers.

Reference parity: these replace the `np.linalg.solve` /
`o3d.pipelines.registration` internal solves used by the CPU pipeline
(pcm_tools.py:49-66) — same systems, closed form.
"""
from __future__ import annotations

import jax.numpy as jnp


def solve3x3(a, b):
    """Batched 3x3 solve via the adjugate (Cramer).  a: (..., 3, 3),
    b: (..., 3) -> (..., 3).  Callers regularize `a` (the ICP gradient
    setup adds a 1e-6 ridge), so det is bounded away from 0; the 1e-30
    guard only protects fully-degenerate masked rows."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = (
        a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    )
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    # adjugate rows (cofactors of a^T)
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    x0 = c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]
    x1 = c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]
    x2 = c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) * inv_det[..., None]


def solve_psd(a, b, n: int | None = None):
    """Unrolled Cholesky solve for one small SPD system (static n <= 8).
    a: (n, n), b: (n,) -> (n,).  Pure scalar arithmetic — no LU custom
    call — for the per-iteration 6x6 Gauss-Newton step of colored ICP
    (icp.py).  Callers add a ridge, so pivots stay positive."""
    if n is None:
        n = a.shape[-1]
    # Cholesky a = L L^T, scalars unrolled at trace time
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        ljj = jnp.sqrt(jnp.maximum(s, 1e-30))
        l[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, n):
            s = a[i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x)
