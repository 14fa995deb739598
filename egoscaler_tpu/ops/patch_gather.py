"""Pallas correlation-patch gather for the window tracker.

The tracker's correlation pyramid gathers a (2r+2)^2 feature patch
around every (frame, track) coordinate each refinement iteration
(models/tracker.corr_features).  The XLA lowering (vmapped
dynamic_slice -> gather) achieves only ~100 GB/s and is the tracker's
single largest cost with the scaled asset (~52 of ~99 ms per 16-frame
clip, profiled round 5 — ROUND6.md item 4); the tracker in turn is 60%
of the 80-frame pipeline.

This kernel streams the patches with explicit double-buffered DMAs at
scalar-prefetched offsets, shaped around the Mosaic alignment rules
(a first attempt sliced the sublane-tiled W dim at arbitrary offsets —
"failed to prove tile index divisible by 8"):

* the feature map is viewed (T, Hp, Wp*C): the W offset becomes
  sx * C lanes, provably 128-aligned when C % 128 == 0 (the scaled
  config's C=128; other widths fall back to the XLA path);
* the H offset is passed PRE-DIVIDED (sy // 8) and multiplied by 8
  in-kernel, so sublane alignment is provable; the DMA grabs 16 rows
  and the true 8-row window [sy%8, sy%8+8) is selected by a small
  selection-matrix matmul — no dynamic in-VMEM slicing;
* dot-before-blend: the bilinear blend is linear in the patch and the
  channel dot is linear in everything, so the (d, d) integer patch is
  correlated with the track's template FIRST and the four shifted
  (k, k) windows of the SCALAR field are blended — identical math to
  blending (k,k,C) then correlating, at 1/C the blend cost.  The
  channel dot in the folded (d, d*C) layout is a multiply with the
  8x-tiled template followed by a block-diagonal-ones matmul (segment
  sum) — again no in-kernel reshapes;
* output stays (N, k, k) and is reshaped to the (T, Q, k*k) token
  layout outside.

Reference role analogue: SpaTracker's CorrBlock.sample
(models/spatracker/models/core/spatracker/blocks.py bilinear_sampler) —
torch grid_sample over the correlation pyramid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8   # (frame, track) pairs gathered/computed per grid step
ROWS = 16   # DMA'd rows per patch (8-aligned origin + 8-row window + frac)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_kernel(
    syb_ref,     # scalar-prefetch (N,) int32: sy // 8 (8-aligned origin)
    syo_ref,     # scalar-prefetch (N,) int32: sy % 8 (window offset)
    sx_ref,      # scalar-prefetch (N,) int32: patch-origin col
    fmp_ref,     # (T, Hp, Wp*C) in HBM (ANY)
    tf_ref,      # (1, GROUP, d*C) f32: template tiled d times along lanes
    frac_ref,    # (1, GROUP, 2) f32 bilinear fractions (x, y)
    e2_ref,      # (d*C, d) f32 block-diagonal ones (segment-sum matmul)
    out_ref,     # (GROUP, k, k) f32
    patches,     # VMEM scratch (2, GROUP, ROWS, d*C) in fmp dtype
    sems,        # DMA semaphores (2, GROUP)
    *,
    d: int,
    c: int,
    q_blocks: int,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    dc = d * c

    def dma(slot, block, j):
        row = block * GROUP + j
        t = block // q_blocks
        return pltpu.make_async_copy(
            fmp_ref.at[t, pl.ds(syb_ref[row] * 8, ROWS),
                       pl.ds(sx_ref[row] * c, dc)],
            patches.at[slot, j],
            sems.at[slot, j],
        )

    def start_block(slot, block):
        for j in range(GROUP):
            dma(slot, block, j).start()

    @pl.when(i == 0)
    def _prologue():
        start_block(0, 0)

    @pl.when(i + 1 < n)
    def _prefetch_next():
        start_block((i + 1) % 2, i + 1)

    fr = frac_ref[0]                                   # (G, 2)
    e2 = e2_ref[...]                                   # (d*C, d)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (d, ROWS), 0)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (d, ROWS), 1)
    c8s = []
    for j in range(GROUP):
        dma(i % 2, i, j).wait()
        row = i * GROUP + j
        patch = patches[i % 2, j].astype(jnp.float32)  # (ROWS, d*C)
        # row-window select: Msel[r, s] = (s == r + sy%8) — one matmul
        # instead of a dynamic sublane slice
        msel = (cols_iota == rows_iota + syo_ref[row]).astype(jnp.float32)
        win = jax.lax.dot_general(
            msel, patch, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (d, d*C)
        prod = win * tf_ref[0, j][None, :]             # (d, d*C)
        c8 = jax.lax.dot_general(
            prod, e2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (d, d) = (y, x)
        c8s.append(c8)
    c8 = jnp.stack(c8s)                                # (G, d, d)
    wx = fr[:, 0][:, None, None]
    wy = fr[:, 1][:, None, None]
    out_ref[...] = (
        c8[:, :-1, :-1] * (1.0 - wy) * (1.0 - wx)
        + c8[:, :-1, 1:] * (1.0 - wy) * wx
        + c8[:, 1:, :-1] * wy * (1.0 - wx)
        + c8[:, 1:, 1:] * wy * wx
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def corr_patches_tpu(
    fmp: jax.Array,    # (T, Hp, Wp, C) EDGE-PADDED feature maps
    sy: jax.Array,     # (T*Q,) int32 patch-origin rows in the padded map
    sx: jax.Array,     # (T*Q,) int32 patch-origin cols
    frac: jax.Array,   # (T*Q, 2) f32 bilinear fractions (x, y)
    tf: jax.Array,     # (Q, C) template features
    *,
    radius: int,
) -> jax.Array:
    """Correlation patches (T*Q, k, k) f32, k = 2*radius + 1.

    Equivalent to per-(t, q): bilinear (k,k,C) patch at the fractional
    coordinate, dotted with tf[q] over channels (models/tracker
    _sample_patches + channel dot, scaled by the caller).

    Constraints (fall back to the XLA path otherwise): C % 128 == 0,
    Q % GROUP == 0.  The DMA needs ROWS rows from an 8-aligned origin:
    the padded map must have Hp >= 8*(max sy//8) + ROWS, guaranteed by
    the caller padding H to a multiple of 8 plus ROWS slack.
    """
    t, hp, wp, c = fmp.shape
    n = sy.shape[0]
    q = tf.shape[0]
    assert n % q == 0 and (n // q) == t, (n, q, t)
    assert q % GROUP == 0, f"Q must be a multiple of {GROUP}, got {q}"
    assert c % 128 == 0, f"C must be a multiple of 128, got {c}"
    d = 2 * radius + 2
    k = 2 * radius + 1
    q_blocks = q // GROUP
    blocks = n // GROUP

    fmp2 = fmp.reshape(t, hp, wp * c)
    syb = (sy // 8).astype(jnp.int32)
    syo = (sy - syb * 8).astype(jnp.int32)
    # template tiled d times along lanes: prod rows are
    # [x0c0..x0c(C-1), x1c0, ...] so each x-block dots the same template
    tf_tiled = jnp.tile(tf.astype(jnp.float32), (1, d))  # (Q, d*C)
    tf_blocked = tf_tiled.reshape(q_blocks, GROUP, d * c)
    frac_blocked = frac.astype(jnp.float32).reshape(blocks, GROUP, 2)
    # block-diagonal ones: E2[x*C + ch, x] = 1 (segment sum over channels)
    e2 = jnp.repeat(jnp.eye(d, dtype=jnp.float32), c, axis=0)  # (d*C, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, GROUP, d * c), lambda i, syb, syo, sx: (i % q_blocks, 0, 0)
            ),
            pl.BlockSpec((1, GROUP, 2), lambda i, syb, syo, sx: (i, 0, 0)),
            pl.BlockSpec((d * c, d), lambda i, syb, syo, sx: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (GROUP, k, k), lambda i, syb, syo, sx: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, ROWS, d * c), fmp.dtype),
            pltpu.SemaphoreType.DMA((2, GROUP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, d=d, c=c, q_blocks=q_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, k, k), jnp.float32),
        interpret=_interpret(),
    )(syb, syo, sx, fmp2, tf_blocked, frac_blocked, e2)
    return out
