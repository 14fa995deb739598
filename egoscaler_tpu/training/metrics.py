"""Trajectory quality metrics: ADE / FDE / IDE / DTW / geodesic distance.

Reference: egoscaler/models/utils/metrics.py:7-88.  All metrics align the
generated trajectory to the ground-truth length by truncation or
last-point padding (metrics.py:9-20,40-51), then:

  ADE  = mean_t ||gt_t - gen_t||_2
  FDE  = ||gt_last - gen_last||_2
  IDE  = ||gt_0 - gen_0||_2
  DTW  = dynamic-time-warping distance with euclidean ground cost
  GD   = mean_t 2*arccos(<q_gen, q_gt>)   (rotvec -> quat)

Note: the reference computes DTW via the approximate `fastdtw`; we
implement EXACT dtw (O(T^2) DP via lax.scan) — exact >= fastdtw quality
and static-shape friendly.  The reference's metric calls also carry an
accidental extra batch dim (train.py:258-260, SURVEY.md §8.5); we
implement the intended per-waypoint semantics.

All functions are jittable and take fixed-shape (T, D) arrays with
optional valid-lengths so batch evaluation runs on-device.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from egoscaler_tpu.geometry.rotations import quat_from_rotvec


def _align(gen: jax.Array, gt_len: Optional[jax.Array], gen_len: Optional[jax.Array],
           t_out: int) -> jax.Array:
    """Truncate/pad `gen` (T_gen, D) to t_out rows, repeating the last
    valid row (metrics.py:12-20)."""
    t_gen = gen.shape[0]
    if gen_len is None:
        gen_len = jnp.asarray(t_gen, jnp.int32)
    idx = jnp.minimum(jnp.arange(t_out), gen_len - 1)
    idx = jnp.clip(idx, 0, t_gen - 1)
    return gen[idx]


def _valid_mask(t: int, length: Optional[jax.Array]) -> jax.Array:
    if length is None:
        return jnp.ones((t,), jnp.float32)
    return (jnp.arange(t) < length).astype(jnp.float32)


def average_displacement_error(
    gen: jax.Array,
    gt: jax.Array,
    gen_len: Optional[jax.Array] = None,
    gt_len: Optional[jax.Array] = None,
) -> jax.Array:
    t = gt.shape[0]
    g = _align(gen, gt_len, gen_len, t)
    d = jnp.linalg.norm(gt - g, axis=-1)
    w = _valid_mask(t, gt_len)
    return jnp.sum(d * w) / jnp.sum(w).clip(1.0)


def final_displacement_error(
    gen: jax.Array,
    gt: jax.Array,
    gen_len: Optional[jax.Array] = None,
    gt_len: Optional[jax.Array] = None,
) -> jax.Array:
    t = gt.shape[0]
    g = _align(gen, gt_len, gen_len, t)
    last = (gt_len - 1) if gt_len is not None else (t - 1)
    return jnp.linalg.norm(gt[last] - g[last])


def initial_displacement_error(gen: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.linalg.norm(gt[0] - gen[0])


def dynamic_time_warping(
    gen: jax.Array,
    gt: jax.Array,
    gen_len: Optional[jax.Array] = None,
    gt_len: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact DTW distance with euclidean ground metric, O(T_gen * T_gt).

    Masked rows (beyond the valid lengths) contribute zero cost, so the
    optimal path simply passes through them.
    """
    t1, t2 = gen.shape[0], gt.shape[0]
    cost = jnp.linalg.norm(gen[:, None, :] - gt[None, :, :], axis=-1)
    if gen_len is not None:
        cost = jnp.where((jnp.arange(t1) < gen_len)[:, None], cost, 0.0)
    if gt_len is not None:
        cost = jnp.where((jnp.arange(t2) < gt_len)[None, :], cost, 0.0)

    big = jnp.asarray(jnp.finfo(cost.dtype).max / 4, cost.dtype)

    def row_step(prev_row, cost_row):
        # prev_row = D[i-1, :]; compute D[i, :] left-to-right.
        # upleft[j] = D[i-1, j-1] (boundary: +big at j=0)
        upleft = jnp.concatenate([jnp.full((1,), big, cost.dtype), prev_row[:-1]])

        def col_step(left, inputs):
            c, up, ul = inputs
            d = c + jnp.minimum(jnp.minimum(left, up), ul)
            return d, d

        _, row = jax.lax.scan(col_step, big, (cost_row, prev_row, upleft))
        return row, None

    # row 0: D[0, j] = cumsum(cost[0, :j+1])
    row0 = jnp.cumsum(cost[0])
    final_row, _ = jax.lax.scan(row_step, row0, cost[1:])
    return final_row[-1]


def geodesic_distance(
    gen_rotvec: jax.Array,
    gt_rotvec: jax.Array,
    gen_len: Optional[jax.Array] = None,
    gt_len: Optional[jax.Array] = None,
    reference_faithful: bool = True,
) -> jax.Array:
    """Mean per-step quaternion angular distance (metrics.py:61-88).

    With `reference_faithful=True` the dot product is NOT abs'd, matching
    metrics.py:82 (which treats q and -q as different); set False for the
    mathematically correct double-cover-invariant distance.
    """
    t = gt_rotvec.shape[0]
    g = _align(gen_rotvec, gt_len, gen_len, t)
    qg = quat_from_rotvec(g[..., :3])
    qt = quat_from_rotvec(gt_rotvec[..., :3])
    dot = jnp.sum(qg * qt, axis=-1)
    if not reference_faithful:
        dot = jnp.abs(dot)
    ang = 2.0 * jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    w = _valid_mask(t, gt_len)
    return jnp.sum(ang * w) / jnp.sum(w).clip(1.0)


def trajectory_metrics(
    gen: jax.Array,
    gt: jax.Array,
    gen_len: Optional[jax.Array] = None,
    gt_len: Optional[jax.Array] = None,
) -> dict:
    """All metrics for one (T, 6) [xyz rotvec] trajectory pair. vmap over a
    batch and jit for on-device eval."""
    return {
        "ade": average_displacement_error(gen, gt, gen_len, gt_len),
        "fde": final_displacement_error(gen, gt, gen_len, gt_len),
        "ide": initial_displacement_error(gen, gt),
        "dtw": dynamic_time_warping(gen, gt, gen_len, gt_len),
        "gd": geodesic_distance(gen, gt, gen_len, gt_len),
    }
