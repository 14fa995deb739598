"""Cyclic-Jacobi eigendecomposition for small symmetric matrices.

Backend-robust: XLA's iterative f32 SVD/eigh (QDWH) can carry ~1e-3 error
on some platforms, which is fatal for Kabsch rotation parity.  Cyclic
Jacobi on a 3x3/4x4 symmetric matrix reaches f32 machine precision in a
handful of sweeps, is fully jittable/vmappable, and costs nothing at
these sizes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def jacobi_eigh(a: jax.Array, sweeps: int = 10) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition of a symmetric (..., n, n) matrix, n small/static.

    Returns (eigenvalues (..., n) ascending, eigenvectors (..., n, n) with
    columns as eigenvectors), like jnp.linalg.eigh.
    """
    n = a.shape[-1]
    batch = a.shape[:-2]
    v = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)

    def rotate(av, pq):
        a, v = av
        p, q = pq
        apq = a[..., p, q]
        app = a[..., p, p]
        aqq = a[..., q, q]
        # Rutishauser-stable rotation computation
        tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(tau * tau + 1.0))
        t = jnp.where(tau == 0, 1.0, t)  # tau==0 -> 45 deg
        t = jnp.where(apq == 0, 0.0, t)
        c = 1.0 / jnp.sqrt(t * t + 1.0)
        s = t * c
        c_ = c[..., None]
        s_ = s[..., None]
        # A' = J^T A J with J[p,p]=J[q,q]=c, J[p,q]=s, J[q,p]=-s, applied as
        # row/column rotations (elementwise — no matmul, precision-exact).
        colp, colq = a[..., :, p], a[..., :, q]
        a = a.at[..., :, p].set(c_ * colp - s_ * colq)
        a = a.at[..., :, q].set(s_ * colp + c_ * colq)
        rowp, rowq = a[..., p, :], a[..., q, :]
        a = a.at[..., p, :].set(c_ * rowp - s_ * rowq)
        a = a.at[..., q, :].set(s_ * rowp + c_ * rowq)
        vcolp, vcolq = v[..., :, p], v[..., :, q]
        v = v.at[..., :, p].set(c_ * vcolp - s_ * vcolq)
        v = v.at[..., :, q].set(s_ * vcolp + c_ * vcolq)
        return (a, v)

    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]
    for _ in range(sweeps):
        for pq in pairs:
            a, v = rotate((a, v), pq)

    evals = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(evals, axis=-1)
    evals = jnp.take_along_axis(evals, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return evals, v
