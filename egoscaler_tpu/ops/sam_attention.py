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

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sam_flash_kernel(
    q_ref,      # (1, 1, bq, dp)
    k_ref,      # (1, 1, T, dp)
    v_ref,      # (1, 1, T, dp)
    relh_ref,   # (1, 1, bq, gh)  bias vs target row
    relw_ref,   # (1, 1, bq, gw)  bias vs target col
    o_ref,      # (1, 1, bq, dp)
    *,
    block_kv: int,
    scale: float,
    grid_w: int,
    kv_len: int,
):
    bq = q_ref.shape[2]
    dp = q_ref.shape[3]
    rows_per_blk = block_kv // grid_w
    num_kv_blocks = kv_len // block_kv

    q = q_ref[0, 0, :, :]
    relw = relw_ref[0, 0, :, :]  # (bq, gw)

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(ki * block_kv, block_kv), :]
        v_blk = v_ref[0, 0, pl.ds(ki * block_kv, block_kv), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale

        # decomposed bias tile: target index t = th * grid_w + tw
        relh_blk = relh_ref[
            0, 0, :, pl.ds(ki * rows_per_blk, rows_per_blk)
        ]  # (bq, rows_per_blk)
        bias = (
            jnp.broadcast_to(
                relh_blk[:, :, None], (bq, rows_per_blk, grid_w)
            )
            + jnp.broadcast_to(
                relw[:, None, :], (bq, rows_per_blk, grid_w)
            )
        ).reshape(bq, block_kv)
        s = s + bias

        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, dp), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    o_ref[0, 0, :, :] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(
        o_ref.dtype
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

    block_q = min(512, s)
    # kv blocks must cover whole token rows so the bias tile is a
    # (rows x gw) rectangle
    block_kv = min(512 // gw * gw if gw <= 512 else gw, s)
    block_kv = max(block_kv, gw)
    assert s % block_q == 0 and s % block_kv == 0, (s, block_q, block_kv)

    kernel = functools.partial(
        _sam_flash_kernel,
        block_kv=block_kv,
        scale=scale,
        grid_w=gw,
        kv_len=s,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dp), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, s, dp), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, dp), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q, gh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, gw), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dp), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dp), q.dtype),
        interpret=_interpret(),
    )(q, k, v, rel_h.astype(jnp.float32), rel_w.astype(jnp.float32))
    return out[..., :d]
