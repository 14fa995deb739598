"""int8 KV-cache decode attention (KV8) — Pallas flash-decode kernel.

Single-token decode is HBM-bandwidth bound: every step streams the whole
KV cache (flagship 1.1B bs8 at T=678: ~1.4 GB of bf16 K+V per step,
rivaling the int8 param stream — ROUND3.md KV8 note).  Storing the cache
as int8 with per-token-per-head scales halves that traffic.  As with the
w8a16 weight kernel (ops/quant_matmul.py), XLA cannot fuse the
int8->bf16 convert into a dot operand — `k8.astype(bf16) * scale`
materializes a bf16 copy of the cache in HBM first, reading MORE bytes
than the bf16 cache it was meant to beat.  This kernel streams int8 KV
blocks from HBM, dequantizes in VMEM, and runs the streaming-softmax
(flash) accumulation per query.

Quantization: symmetric per-(token, head) absmax/127 over the head dim —
K carries rotary phases and V raw values, both centered; per-vector
scales keep the quantization error ~0.4% of the vector range.  The
quality gate is greedy token agreement vs the bf16 cache
(tests/test_kv8.py + scripts/bench_quant_decode.py --kv8 on a trained
checkpoint).

Reference role analogue: the serving flash-attention patch
(llama_flash_attn_monkey_patch.py:20-107) — the reference's only
attention-path serving optimization; it has no quantized cache.

Layout: the cache keeps the bf16 layout (L, B, T, H, D) (block DMAs are
(Tb, H*D) int8 = Tb x 2 KB contiguous rows at flagship size) plus scale
arrays (L, B, T, H) f32.  GQA (kvh < h) folds query heads into groups of
g = h // kvh per KV head.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def quantize_kv(t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., D) float -> ((..., D) int8, (...,) f32 per-vector scale)."""
    t = t.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(t), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(t / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(
        dtype
    )


def _kv8_kernel(
    q_ref,      # (1, KVH, G, D) f32 — pre-scaled by D**-0.5
    k_ref,      # (1, Tb, KVH, D) int8
    ks_ref,     # (1, Tb, KVH) f32
    v_ref,      # (1, Tb, KVH, D) int8
    vs_ref,     # (1, Tb, KVH) f32
    msk_ref,    # (1, 1, Tb) int32 (causal & kv_mask, 1 = attend) — the
                # (B, 1, T) layout keeps the block's last-two dims
                # (1, Tb) legal under the Mosaic (8, 128) tiling rule; a
                # (B, T) mask with (1, Tb) blocks is NOT lowerable
                # (sublane block 1 over array dim B)
    o_ref,      # (1, KVH, G, D)
    acc_ref,    # VMEM (KVH, G, D) f32
    m_ref,      # VMEM (KVH, G) f32
    l_ref,      # VMEM (KVH, G) f32
    *,
    nt: int,
    kvh: int,
):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # f32 arithmetic masking: Mosaic only supports non-no-op minor-dim
    # insertion ([:, None]) for 32-bit types, so a bool/int8 mask cannot
    # be broadcast against (Tb, G) scores inside the kernel
    fm = msk_ref[0, 0].astype(jnp.float32)  # (Tb,) 1 = attend
    ksc = ks_ref[0]   # (Tb, KVH)
    vsc = vs_ref[0]
    # static loop over KV heads: 2-D dots keep Mosaic on the MXU path.
    # Operands stay f32: mixed bf16-operand/f32-result dot_generals trip
    # a Mosaic vector.broadcast verifier bug at these (Tb, D) x (G, D)
    # shapes, and decode is HBM-bound (the int8 cache stream), so the
    # f32 MXU rate is irrelevant here.
    for h in range(kvh):
        kh = k_ref[0, :, h, :].astype(jnp.float32)    # (Tb, D)
        qh = q_ref[0, h]                              # (G, D) f32
        s = jax.lax.dot_general(
            kh, qh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tb, G)
        s = s * ksc[:, h][:, None]
        # fm==1 keeps s; fm==0 drives it to -1e30 (NEG_INF)
        s = s * fm[:, None] + (fm[:, None] - 1.0) * (-_NEG_INF)
        m_prev = m_ref[h]                              # (G,)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
        alpha = jnp.exp(m_prev - m_new)                # (G,)
        # masked rows multiply to exactly 0 (an all-masked block would
        # otherwise make exp(s - m) == 1 with m still at -inf)
        p = jnp.exp(s - m_new[None, :]) * fm[:, None]
        l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=0)
        pv = p * vsc[:, h][:, None]                   # (Tb, G) f32
        vh = v_ref[0, :, h, :].astype(jnp.float32)    # (Tb, D)
        acc_ref[h] = acc_ref[h] * alpha[:, None] + jax.lax.dot_general(
            pv, vh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, D)
        m_ref[h] = m_new

    @pl.when(ti == nt - 1)
    def _finish():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)[..., None]
        ).astype(o_ref.dtype)


def _pad_to(a: jax.Array, axis: int, mult: int) -> jax.Array:
    pad = (-a.shape[axis]) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _kv8_kernel_fold(
    qbd_ref,    # (1, KVH*D, KVH) f32 — block-diagonal q (pre-scaled)
    e_ref,      # (KVH, KVH*D) f32 — head->lane-span expansion constant
    k_ref,      # (1, Tb, KVH*D) int8 (head dims pre-flattened)
    ks_ref,     # (1, Tb, KVH) f32
    v_ref,      # (1, Tb, KVH*D) int8
    vs_ref,     # (1, Tb, KVH) f32
    msk_ref,    # (1, 1, Tb) int32 (1 = attend)
    o_ref,      # (1, 1, KVH*D)
    acc_ref,    # VMEM (1, KVH*D) f32
    m_ref,      # VMEM (1, KVH) f32
    l_ref,      # VMEM (1, KVH) f32
    *,
    nt: int,
):
    """MXU-folded KV8 flash-decode (G=1 / MHA path).

    The v1 kernel loops KV heads and issues (Tb, D) x (G=1, D) dots —
    matrix-VECTOR products that leave the MXU idle and made KV8 a 0.53x
    whole-generate regression at flagship (QUANT_BENCH r5).  This
    variant folds all heads into three MXU-shaped matmuls per block:

      scores  (Tb, KVH)    = K2 (Tb, KVH*D) @ QBD (KVH*D, KVH)
              where QBD is block-diagonal (head h's D-slice lives in
              column h), so cross-head terms vanish by construction;
      p_exp   (Tb, KVH*D)  = P (Tb, KVH) @ E (KVH, KVH*D)
              with E[h, h*D+d] = 1 broadcasting per-head weights across
              that head's lane span;
      acc     (1, KVH*D)  += ones (1, Tb) @ (p_exp * V2 * vs_exp)
              — the weighted-value reduction as a matmul, no
              cross-sublane reduce.

    All operands stay f32 (ROUND5.md Mosaic note: mixed bf16/f32
    dot_generals trip a vector.broadcast verifier bug); decode is
    HBM-bound on the int8 cache stream, so MXU rate is not the limit.
    """
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    e = e_ref[...]                                   # (KVH, KVH*D)
    fm = msk_ref[0, 0].astype(jnp.float32)           # (Tb,)
    kf = k_ref[0].astype(jnp.float32)                # (Tb, KVH*D)
    s = jax.lax.dot_general(
        kf, qbd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (Tb, KVH)
    s = s * ks_ref[0]
    s = s * fm[:, None] + (fm[:, None] - 1.0) * (-_NEG_INF)

    m_prev = m_ref[0]                                # (KVH,)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
    alpha = jnp.exp(m_prev - m_new)                  # (KVH,)
    p = jnp.exp(s - m_new[None, :]) * fm[:, None]    # (Tb, KVH)
    ones_row = jnp.ones((1, s.shape[0]), jnp.float32)
    l_ref[...] = l_ref[...] * alpha[None, :] + jax.lax.dot_general(
        ones_row, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (1, KVH)
    pv = p * vs_ref[0]                               # (Tb, KVH)
    p_exp = jax.lax.dot_general(
        pv, e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (Tb, KVH*D)
    vf = v_ref[0].astype(jnp.float32)                # (Tb, KVH*D)
    contrib = jax.lax.dot_general(
        ones_row, p_exp * vf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (1, KVH*D)
    alpha_exp = jax.lax.dot_general(
        alpha[None, :], e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (1, KVH*D)
    acc_ref[...] = acc_ref[...] * alpha_exp + contrib
    m_ref[...] = m_new[None, :]

    @pl.when(ti == nt - 1)
    def _finish():
        l_exp = jax.lax.dot_general(
            jnp.maximum(l_ref[...], 1e-30), e_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (1, KVH*D)
        o_ref[0] = (acc_ref[...] / l_exp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "impl"))
def decode_attention_kv8(
    q: jax.Array,        # (B, H, D) single-token queries
    k8: jax.Array,       # (B, T, KVH, D) int8 (one layer's cache slice)
    k_scale: jax.Array,  # (B, T, KVH) f32
    v8: jax.Array,       # (B, T, KVH, D) int8
    v_scale: jax.Array,  # (B, T, KVH) f32
    mask: jax.Array,     # (B, T) bool — causal & kv_mask, True = attend
    *,
    block_t: int = 256,
    impl: str = "auto",  # "fold" (MXU, MHA only) | "heads" (v1) | "auto"
) -> jax.Array:
    """Flash-decode over an int8 KV cache.  Returns (B, H, D) in q.dtype
    with f32 softmax statistics (same numerics contract as
    ops/attention.xla_attention at s=1).

    impl="fold" routes MHA (kvh == h) through the block-diagonal-folded
    MXU kernel (_kv8_kernel_fold); "heads" is the per-head-loop v1 (the
    only option under GQA); "auto" picks fold for MHA.
    """
    b, h, d = q.shape
    _, t, kvh, _ = k8.shape
    assert h % kvh == 0, (h, kvh)
    g = h // kvh

    use_fold = (impl == "fold") or (impl == "auto" and g == 1)
    if use_fold:
        assert g == 1, "fold impl supports MHA only (kvh == h)"
        return _decode_kv8_fold(
            q, k8, k_scale, v8, v_scale, mask, block_t=block_t
        )

    qs = (q.astype(jnp.float32) * (d ** -0.5)).reshape(b, kvh, g, d)
    block_t = min(block_t, max(128, t))
    k8p = _pad_to(k8, 1, block_t)
    v8p = _pad_to(v8, 1, block_t)
    ksp = _pad_to(k_scale.astype(jnp.float32), 1, block_t)
    vsp = _pad_to(v_scale.astype(jnp.float32), 1, block_t)
    mp = _pad_to(mask.astype(jnp.int32)[:, None, :], 2, block_t)  # pads 0
    tp = k8p.shape[1]
    nt = tp // block_t

    out = pl.pallas_call(
        functools.partial(_kv8_kernel, nt=nt, kvh=kvh),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, kvh, g, d), lambda bi, ti: (bi, 0, 0, 0)),
            pl.BlockSpec((1, block_t, kvh, d), lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, block_t, kvh), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, block_t, kvh, d), lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, block_t, kvh), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, block_t), lambda bi, ti: (bi, 0, ti)),
        ],
        out_specs=pl.BlockSpec((1, kvh, g, d), lambda bi, ti: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((kvh, g, d), jnp.float32),
            pltpu.VMEM((kvh, g), jnp.float32),
            pltpu.VMEM((kvh, g), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qs, k8p, ksp, v8p, vsp, mp)
    return out.reshape(b, h, d)


def _decode_kv8_fold(
    q: jax.Array,        # (B, H, D) — MHA (kvh == h)
    k8: jax.Array,       # (B, T, H, D) int8
    k_scale: jax.Array,  # (B, T, H) f32
    v8: jax.Array,       # (B, T, H, D) int8
    v_scale: jax.Array,  # (B, T, H) f32
    mask: jax.Array,     # (B, T) bool
    *,
    block_t: int,
) -> jax.Array:
    b, h, d = q.shape
    t = k8.shape[1]
    hd = h * d

    qs = q.astype(jnp.float32) * (d ** -0.5)          # (B, H, D)
    eye = jnp.eye(h, dtype=jnp.float32)
    # QBD[b, h*D+d, g] = qs[b, h, d] * eye[h, g] — block-diagonal
    qbd = (qs[:, :, :, None] * eye[:, None, :]).reshape(b, hd, h)
    # E[h, h*D+d] = 1: per-head lane-span broadcast (kron(eye, ones_D))
    e_mat = jnp.repeat(eye, d, axis=1)                # (H, H*D)

    block_t = min(block_t, max(128, t))
    # head dims flatten OUTSIDE the kernel (free relayout in XLA;
    # in-kernel minor-dim reshapes are a Mosaic hazard)
    k2 = _pad_to(k8.reshape(b, t, hd), 1, block_t)
    v2 = _pad_to(v8.reshape(b, t, hd), 1, block_t)
    ksp = _pad_to(k_scale.astype(jnp.float32), 1, block_t)
    vsp = _pad_to(v_scale.astype(jnp.float32), 1, block_t)
    mp = _pad_to(mask.astype(jnp.int32)[:, None, :], 2, block_t)
    nt = k2.shape[1] // block_t

    out = pl.pallas_call(
        functools.partial(_kv8_kernel_fold, nt=nt),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, hd, h), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((h, hd), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, block_t, hd), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, block_t, h), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, block_t, hd), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, block_t, h), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, 1, block_t), lambda bi, ti: (bi, 0, ti)),
        ],
        out_specs=pl.BlockSpec((1, 1, hd), lambda bi, ti: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, hd), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qbd, e_mat, k2, ksp, v2, vsp, mp)
    return out.reshape(b, h, d)


def decode_attention_kv8_xla(
    q: jax.Array,
    k8: jax.Array,
    k_scale: jax.Array,
    v8: jax.Array,
    v_scale: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """XLA oracle: dequantize through HBM then xla_attention (correctness
    reference and the multi-token fallback path — not a bandwidth win)."""
    from egoscaler_tpu.ops.attention import xla_attention

    k = dequantize_kv(k8, k_scale, q.dtype)
    v = dequantize_kv(v8, v_scale, q.dtype)
    g = q.shape[1] // k.shape[2]
    if g > 1:  # GQA: repeat kv heads for the reference contraction
        k = jnp.repeat(k, g, axis=2)
        v = jnp.repeat(v, g, axis=2)
    out = xla_attention(q[:, None], k, v, mask=mask[:, None, None, :])
    return out[:, 0]
