"""Colored ICP refinement (Park, Zhou, Koltun ICCV 2017) as a fixed-
iteration Gauss-Newton loop.

Open3D equivalent: `registration_colored_icp(source, target, dist,
init, TransformationEstimationForColoredICP,
ICPConvergenceCriteria(1e-6, 1e-6, 30))` (pcm_tools.py:49-66).

Joint objective per correspondence (s -> its nearest target t):
  geometric:    r_G = n_t . (s' - p_t)                (point-to-plane)
  photometric:  r_C = C_t(proj_t(s')) - c_s
where C_t is the target color intensity linearized on t's tangent plane
via a precomputed per-point color gradient d_t:
  C_t(x) ~= c_t + d_t . (x - p_t).
Combined with lambda_geometric = 0.968 (Open3D default):
  E = sum lambda * r_G^2 + (1 - lambda) * r_C^2.

Each Gauss-Newton step solves the 6x6 normal equations for the twist
xi = (omega, t) with small-angle update, inside a `lax.while_loop`
carrying Open3D's ICPConvergenceCriteria semantics: stop when both the
fitness and inlier-RMSE deltas between consecutive iterations fall
below 1e-6, or at max_iterations.  (The continuation predicate runs
on-device — no host sync.)  Measured on the bench scene the loop exits
after ~4 iterations (RANSAC init is tight): 15.9 -> ~4 ms per pair.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from egoscaler_tpu.geometry.solve import solve3x3, solve_psd
from egoscaler_tpu.geometry.transforms import se3_compose, se3_from_rt
from egoscaler_tpu.registration.neighbors import cross_knn, hybrid_knn

_LAMBDA_GEOMETRIC = 0.968


class ICPResult(NamedTuple):
    transformation: jax.Array
    fitness: jax.Array
    inlier_rmse: jax.Array


def _intensity(colors: jax.Array) -> jax.Array:
    return jnp.mean(colors, axis=-1)


def color_gradients(
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    mask: jax.Array,
    radius: float,
    max_nn: int = 30,
    neighbors=None,
) -> jax.Array:
    """Per-point tangent-plane color gradient d (M, 3): least squares of
    c_q - c_p ~= d . (q' - p) with q' the tangent-plane projection of q,
    constrained d . n = 0 (Park et al. eq. 9; Open3D InitializePointCloudForColoredICP).

    `neighbors`: optional precomputed self-INCLUSIVE ascending kNN table
    (idx, dist2) with >= max_nn + 1 columns (prepare_cloud's shared
    table); columns 1..max_nn radius-masked equal the self-exclusive
    hybrid search, skipping a fresh M x M distance pass per ICP pair."""
    inten = _intensity(colors)
    if neighbors is not None:
        nb_idx, nb_d2 = neighbors
        assert nb_idx.shape[1] >= max_nn + 1, (
            f"neighbor table too narrow: {nb_idx.shape[1]} < {max_nn + 1}"
        )
        idx = nb_idx[:, 1 : max_nn + 1]
        nvalid = (nb_d2[:, 1 : max_nn + 1] <= radius * radius) & mask[:, None]
    else:
        idx, nvalid = hybrid_knn(points, mask, radius, max_nn, include_self=False)
    # packed single gather (see fpfh.py): points + intensity in one
    # 4-lane row instead of two scattered row gathers
    packed = jnp.concatenate([points, inten[:, None]], axis=1)  # (M, 4)
    pk = packed[idx]                      # (M, K, 4)
    q = pk[..., 0:3]
    cq = pk[..., 3]
    p = points[:, None, :]
    n = normals[:, None, :]
    # project neighbors on the tangent plane
    qp = q - jnp.sum((q - p) * n, axis=-1, keepdims=True) * n
    a = (qp - p)                          # (M, K, 3)
    b = (cq - inten[:, None])             # (M, K)
    w = nvalid.astype(points.dtype)
    aw = a * w[..., None]
    # normal-constraint row with weight ~ number of neighbors (Open3D uses
    # an extra row [n; 0] to enforce d.n = 0)
    ata = jnp.einsum("mki,mkj->mij", aw, a, precision=jax.lax.Precision.HIGHEST)
    ata = ata + jnp.einsum("mi,mj->mij", normals, normals) * jnp.sum(
        w, -1, keepdims=True
    )[..., None]
    ata = ata + jnp.eye(3) * 1e-6
    atb = jnp.einsum("mki,mk->mi", aw, b, precision=jax.lax.Precision.HIGHEST)
    # closed-form batched 3x3 solve: jnp.linalg.solve's LuDecomposition
    # custom call was the hottest op of the registration stage (3.2 ms
    # per pair for this batch of tiny systems)
    return solve3x3(ata, atb)


def colored_icp(
    source_pts: jax.Array,
    source_cols: jax.Array,
    source_mask: jax.Array,
    target_pts: jax.Array,
    target_cols: jax.Array,
    target_normals: jax.Array,
    target_mask: jax.Array,
    init_transform: jax.Array,
    distance_threshold: float,
    gradient_radius: float,
    max_iterations: int = 30,
    lambda_geometric: float = _LAMBDA_GEOMETRIC,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
    target_neighbors=None,
) -> ICPResult:
    """Refine init_transform (source->target).  All shapes static.

    `target_neighbors`: optional (idx, dist2) self-inclusive kNN table of
    target_pts (see color_gradients) — reuses prepare_cloud's table."""
    tgt_grad = color_gradients(
        target_pts, target_normals, target_cols, target_mask, gradient_radius,
        neighbors=target_neighbors,
    )
    src_inten = _intensity(source_cols)
    tgt_inten = _intensity(target_cols)
    sqrt_lg = jnp.sqrt(lambda_geometric)
    sqrt_lc = jnp.sqrt(1.0 - lambda_geometric)
    # ONE packed correspondence gather per GN iteration instead of four
    # scattered row gathers (pt/normal/gradient/intensity)
    tgt_packed = jnp.concatenate(
        [
            target_pts, target_normals, tgt_grad, tgt_inten[:, None],
            jnp.zeros((target_pts.shape[0], 2), target_pts.dtype),
        ],
        axis=1,
    )  # (M, 12)

    n_src_f = jnp.sum(source_mask).clip(1).astype(jnp.float32)

    def body(carry):
        it, transform, _, prev_fit, prev_rmse = carry
        r = transform[:3, :3]
        t = transform[:3, 3]
        s = source_pts @ r.T + t                      # (S, 3) moved source

        idx, dist = cross_knn(s, source_mask, target_pts, target_mask, k=1)
        idx = idx[:, 0]
        dist = dist[:, 0]
        valid = (dist < distance_threshold) & source_mask

        # convergence bookkeeping (Open3D compares consecutive
        # fitness/inlier_rmse values against the criteria)
        n_in = jnp.sum(valid)
        fit = n_in / n_src_f
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(valid, dist**2, 0.0)) / jnp.maximum(n_in, 1)
        )
        done = (
            (jnp.abs(fit - prev_fit) < relative_fitness)
            & (jnp.abs(rmse - prev_rmse) < relative_rmse)
        )

        pk = tgt_packed[idx]                 # (S, 12) one aligned gather
        pt = pk[:, 0:3]
        nt = pk[:, 3:6]
        dt = pk[:, 6:9]
        ct = pk[:, 9]
        cs = src_inten

        # geometric residual + jacobian rows (w.r.t. twist on the moved pts)
        rg = jnp.sum(nt * (s - pt), axis=-1)
        jg = jnp.concatenate([jnp.cross(s, nt), nt], axis=-1)  # (S, 6)

        # photometric residual: project s onto target tangent plane first
        sp = s - jnp.sum((s - pt) * nt, axis=-1, keepdims=True) * nt
        rc = ct + jnp.sum(dt * (sp - pt), axis=-1) - cs
        # dC/ds = (I - n n^T) d ; jacobian via cross for rotation part
        dproj = dt - jnp.sum(dt * nt, axis=-1, keepdims=True) * nt
        jc = jnp.concatenate([jnp.cross(s, dproj), dproj], axis=-1)

        w = valid.astype(s.dtype)
        jg = jg * (sqrt_lg * w)[:, None]
        rg = rg * (sqrt_lg * w)
        jc = jc * (sqrt_lc * w)[:, None]
        rc = rc * (sqrt_lc * w)

        jtj = (
            jnp.einsum("si,sj->ij", jg, jg, precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum("si,sj->ij", jc, jc, precision=jax.lax.Precision.HIGHEST)
        )
        jtr = jg.T @ rg + jc.T @ rc
        jtj = jtj + jnp.eye(6) * 1e-6
        xi = -solve_psd(jtj, jtr)  # (omega, t); unrolled Cholesky, no LU call

        # small-angle SE(3) update
        omega, trans = xi[:3], xi[3:]
        theta = jnp.linalg.norm(omega)
        k = omega / jnp.maximum(theta, 1e-12)
        kx = jnp.array(
            [
                [0.0, -k[2], k[1]],
                [k[2], 0.0, -k[0]],
                [-k[1], k[0], 0.0],
            ]
        )
        r_up = (
            jnp.eye(3)
            + jnp.sin(theta) * kx
            + (1.0 - jnp.cos(theta)) * (kx @ kx)
        )
        upd = se3_from_rt(r_up, trans)
        return (it + 1, se3_compose(upd, transform), done, fit, rmse)

    def cond(carry):
        it, _, done, _, _ = carry
        return (it < max_iterations) & ~done

    _, transform, _, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(0, jnp.int32),
            init_transform,
            jnp.asarray(False),
            jnp.asarray(-1.0),   # impossible prev values: never converged
            jnp.asarray(-1.0),   # at iteration 0
        ),
    )

    # final fitness/rmse
    r = transform[:3, :3]
    t = transform[:3, 3]
    s = source_pts @ r.T + t
    idx, dist = cross_knn(s, source_mask, target_pts, target_mask, k=1)
    dist = dist[:, 0]
    valid = (dist < distance_threshold) & source_mask
    n_src = jnp.sum(source_mask).clip(1)
    n_in = jnp.sum(valid)
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(valid, dist**2, 0.0)) / jnp.maximum(n_in, 1)
    )
    return ICPResult(transform, n_in / n_src, rmse)
