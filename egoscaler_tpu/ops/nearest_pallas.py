"""Fused nearest-neighbor Pallas kernel for the ICP correspondence step.

`cross_knn(k=1)` via XLA materializes the (Q, M) squared-distance matrix
in HBM (64 MB at 4096^2 f32) and re-reads it for the argmin — the
colored-ICP loop pays that traffic every iteration (30x per pair,
registration/icp.py:102-110).  This kernel streams target blocks
through VMEM and keeps a running (min, argmin) per query row, so HBM
traffic is just the two coordinate arrays: measured ~3x on the ICP
stage at the bench operating point (v5e-lite).

Layout: query coordinates are padded to (_, 8) sublane-friendly rows
and targets transposed to (8, M) lane vectors; masked target rows are
pushed to +1e4 m by the caller (no in-kernel mask plumbing).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e4  # masked-point coordinate (distance^2 ~ 3e8 < f32 overflow)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _nn_kernel(q_ref, p_ref, dist_ref, idx_ref, *, block_m: int):
    """One query block (BQ, 8) vs one target block (8, BM) (targets
    pre-transposed so each coordinate is a natural lane vector).  The
    distance is VPU broadcast arithmetic, NOT an MXU matmul: this XLA
    build runs f32 MXU passes in bf16, and coordinate distances need
    full f32 (bf16 misassigns ~15% of nearest neighbors).  The (BQ,)
    running min/argmin rows are stored as (8, BQ//8) tiles (Mosaic
    requires (8, 128)-tileable output blocks)."""
    j = pl.program_id(1)
    q = q_ref[0]                               # (BQ, 8)
    pt = p_ref[0]                              # (8, BM)
    d = (
        (q[:, 0:1] - pt[0:1, :]) ** 2
        + (q[:, 1:2] - pt[1:2, :]) ** 2
        + (q[:, 2:3] - pt[2:3, :]) ** 2
    )                                          # (BQ, BM)
    rows = dist_ref.shape[1:]                  # (8, BQ//8)
    local_min = jnp.min(d, axis=1).reshape(rows)
    local_arg = (
        jnp.argmin(d, axis=1).astype(jnp.int32) + j * block_m
    ).reshape(rows)

    @pl.when(j == 0)
    def _init():
        dist_ref[0] = local_min
        idx_ref[0] = local_arg

    @pl.when(j > 0)
    def _combine():
        better = local_min < dist_ref[0]
        dist_ref[0] = jnp.where(better, local_min, dist_ref[0])
        idx_ref[0] = jnp.where(better, local_arg, idx_ref[0])


@functools.partial(jax.jit, static_argnames=("block_q", "block_m"))
def nearest_neighbor(
    query: jax.Array,        # (Q, 3) float32
    points: jax.Array,       # (M, 3) float32
    points_mask: jax.Array,  # (M,) bool — False rows never selected
    block_q: int = 1024,
    block_m: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """For each query row: index of the nearest valid point and the
    squared distance.  Exact (not approximate); O(Q + M) HBM traffic."""
    q_n, _ = query.shape
    m_n, _ = points.shape
    qp = jnp.pad(query.astype(jnp.float32), ((0, -q_n % block_q), (0, 5)))
    masked = jnp.where(points_mask[:, None], points.astype(jnp.float32), _FAR)
    pp = jnp.pad(masked, ((0, 0), (0, 5)))          # zero lane padding
    pp = jnp.pad(pp, ((0, -m_n % block_m), (0, 0)),
                 constant_values=_FAR)               # far row padding
    # padded rows sit at _FAR on every axis -> never the minimum for real
    # queries; padded queries get garbage rows that are sliced off below
    qb = qp.reshape(-1, block_q, 8)
    pb = pp.reshape(-1, block_m, 8).transpose(0, 2, 1)  # (n_pb, 8, BM)
    n_qb, n_pb = qb.shape[0], pb.shape[0]

    rows = (8, block_q // 8)
    dist2, idx = pl.pallas_call(
        functools.partial(_nn_kernel, block_m=block_m),
        out_shape=(
            jax.ShapeDtypeStruct((n_qb,) + rows, jnp.float32),
            jax.ShapeDtypeStruct((n_qb,) + rows, jnp.int32),
        ),
        grid=(n_qb, n_pb),
        in_specs=[
            pl.BlockSpec((1, block_q, 8), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, block_m), lambda i, j: (j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1,) + rows, lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1,) + rows, lambda i, j: (i, 0, 0)),
        ),
        interpret=_interpret(),
    )(qb, pb)
    dist2 = dist2.reshape(-1)[:q_n]
    idx = idx.reshape(-1)[:q_n]
    # all-invalid target set: clamp index into range (caller masks by
    # distance threshold anyway)
    idx = jnp.clip(idx, 0, m_n - 1)
    return idx, jnp.maximum(dist2, 0.0)
