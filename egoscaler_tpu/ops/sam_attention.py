"""Pallas flash attention for SAM's global vision blocks.

SAM's ViT-H global attention adds a decomposed relative-position bias
to the scores: bias[(qh, qw), (kh, kw)] = rel_h[qh, qw, kh] +
rel_w[qh, qw, kw] (HF modeling_sam add_decomposed_rel_pos).  At 1024^2
input the (B, 16, 4096, 4096) f32 score/bias/softmax materializations
are ~1 GB each; this kernel streams KV blocks with an online softmax
and reconstructs each (block_q, block_kv) bias tile in VMEM from the
(S, h) / (S, w) decomposed tables, so nothing quadratic touches HBM.

The head dim (80 for ViT-H) is zero-padded to 128 lanes; the softmax
scale must be passed for the ORIGINAL dim.  Inference-only (no custom
VJP) — SAM runs forward-only in the pipeline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sam_flash_kernel(
    q_ref,      # (1, 1, bq, dp)
    k_ref,      # (1, 1, T, dp)
    v_ref,      # (1, 1, T, dp)
    relh_ref,   # (1, 1, bq, gh)  bias vs target row
    relw_ref,   # (1, 1, bq, gw)  bias vs target col
    eh_ref,     # (gh, T) static one-hot expansion: 1 where t // gw == i
    ew_ref,     # (gw, T) static one-hot expansion: 1 where t %  gw == j
    o_ref,      # (1, 1, bq, dp)
    *,
    block_kv: int,
    scale: float,
    grid_w: int,
    kv_len: int,
    kv_valid: int,
):
    bq = q_ref.shape[2]
    dp = q_ref.shape[3]
    num_kv_blocks = kv_len // block_kv

    q = q_ref[0, 0, :, :]
    relh = relh_ref[0, 0, :, :]  # (bq, gh)
    relw = relw_ref[0, 0, :, :]  # (bq, gw)

    def scoped(bias_scratch):
        # full decomposed-bias rows for this q block, built ONCE:
        # bias[s, th * gw + tw] = relh[s, th] + relw[s, tw], expanded
        # with two static one-hot matmuls (Mosaic supports neither
        # cross-lane reshapes nor lane gathers).  The per-KV-block tile
        # is then a pl.ds slice of this (bq, S) VMEM scratch at
        # block_kv (lane-multiple) granularity.
        bias_scratch[:, :] = jnp.dot(
            relh, eh_ref[:, :], preferred_element_type=jnp.float32
        ) + jnp.dot(relw, ew_ref[:, :], preferred_element_type=jnp.float32)

        def body(ki, carry):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[0, 0, pl.ds(ki * block_kv, block_kv), :]
            v_blk = v_ref[0, 0, pl.ds(ki * block_kv, block_kv), :]
            s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
            s = s + bias_scratch[:, pl.ds(ki * block_kv, block_kv)]
            if kv_valid != kv_len:  # static: padded token-count tail
                kv_pos = ki * block_kv + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_kv), 1
                )
                s = jnp.where(kv_pos < kv_valid, s, _NEG_INF)

            m_cur = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[:, None])
            l_new = l_prev * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[:, None] + jnp.dot(
                p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq,), jnp.float32)
        acc0 = jnp.zeros((bq, dp), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
        o_ref[0, 0, :, :] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(
            o_ref.dtype
        )

    pl.run_scoped(
        scoped, bias_scratch=pltpu.VMEM((bq, kv_len), jnp.float32)
    )


def sam_global_attention(
    q: jax.Array,       # (B, H, S, d) heads-major
    k: jax.Array,       # (B, H, S, d)
    v: jax.Array,       # (B, H, S, d)
    rel_h: jax.Array,   # (B, H, S, gh) f32 bias vs target row
    rel_w: jax.Array,   # (B, H, S, gw) f32 bias vs target col
    grid_hw: tuple,     # (gh, gw) token grid; S = gh * gw
    scale: float,
) -> jax.Array:
    """softmax(q k^T * scale + decomposed bias) v without materializing
    the (S, S) scores.  Returns (B, H, S, d)."""
    b, h, s, d = q.shape
    gh, gw = grid_hw
    assert s == gh * gw, (s, grid_hw)

    dp = -(-d // 128) * 128
    if dp != d:
        pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # pad the token axis to a lane multiple (windowed SAM layers run
    # S = 14*14 = 196): padded keys are masked to -inf in-kernel, padded
    # query rows are sliced off below
    sp = s if _interpret() else -(-s // 128) * 128
    if sp != s:
        tpad = ((0, 0), (0, 0), (0, sp - s), (0, 0))
        q = jnp.pad(q, tpad)
        k = jnp.pad(k, tpad)
        v = jnp.pad(v, tpad)
        rel_h = jnp.pad(rel_h, tpad)
        rel_w = jnp.pad(rel_w, tpad)

    # block_q 128 keeps the per-program f32 bias_full (block_q x S) plus
    # the VMEM-resident f32 KV inside the 16 MB budget at S=4096
    block_q = min(128, sp)
    # prefer ~512-wide kv blocks; any 128 multiple dividing sp works (the
    # bias tile is sliced from the full per-row scratch)
    block_kv = sp
    for cand in (512, 256, 128):
        if sp % cand == 0:
            block_kv = cand
            break
    assert sp % block_q == 0 and sp % block_kv == 0, (sp, block_q, block_kv)
    assert _interpret() or block_kv % 128 == 0, (
        f"block_kv {block_kv} must be a 128 multiple on TPU"
    )

    import numpy as np

    t_ids = np.arange(sp)
    # pad columns (t >= s) fall outside [0, gh) / exact-match rows, so
    # their one-hot columns are all-zero -> bias 0 there (masked anyway)
    eh = (t_ids[None, :] // gw == np.arange(gh)[:, None]).astype(np.float32)
    ew = (t_ids[None, :] % gw == np.arange(gw)[:, None]).astype(np.float32)
    ew[:, s:] = 0.0

    kernel = functools.partial(
        _sam_flash_kernel,
        block_kv=block_kv,
        scale=scale,
        grid_w=gw,
        kv_len=sp,
        kv_valid=s,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dp), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sp, dp), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sp, dp), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q, gh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, gw), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((gh, sp), lambda bi, hi, qi: (0, 0)),
            pl.BlockSpec((gw, sp), lambda bi, hi, qi: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dp), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, dp), q.dtype),
        interpret=_interpret(),
    )(
        q, k, v,
        rel_h.astype(jnp.float32), rel_w.astype(jnp.float32),
        jnp.asarray(eh), jnp.asarray(ew),
    )
    return out[:, :, :s, :d]
