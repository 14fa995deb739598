"""Multi-head attention primitives.

Replaces the reference's flash-attn CUDA monkey patch
(models/pointllm/pointllm/train/llama_flash_attn_monkey_patch.py) with
TPU-native attention: a Pallas flash kernel (ops/flash_attention.py) on
TPU, and this XLA einsum path (which XLA fuses well at these sequence
lengths) everywhere else.  Selection happens in `dot_product_attention`.

All inputs are (B, S, H, D) ("BSHD"), bf16-friendly; softmax runs in f32.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def make_causal_mask(s_q: int, s_kv: int, offset: int = 0) -> jax.Array:
    """(s_q, s_kv) bool mask, True = attend.  `offset` shifts query
    positions (for KV-cache decode: query i sits at position offset+i)."""
    q_pos = jnp.arange(s_q)[:, None] + offset
    kv_pos = jnp.arange(s_kv)[None, :]
    return kv_pos <= q_pos


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference XLA attention.  q (B,S,H,D), k/v (B,T,H,D), mask
    broadcastable to (B, H, S, T) bool (True = attend)."""
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    scores = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_offset: int = 0,
    kv_lengths: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention with optional causal masking and right-padded KV lengths.

    q: (B, S, H, D); k, v: (B, T, H, D); kv_lengths: (B,) valid KV length.
    Dispatches to the Pallas flash kernel on TPU, XLA einsum elsewhere.
    """
    b, s, h, d = q.shape
    t = k.shape[1]

    backend = jax.default_backend()
    if backend == "tpu" and d % 64 == 0 and s >= 128:
        # d=64 blocks are legal (last block dim == full dim); inside large
        # fused models flash avoids the f32 score materialization that
        # dominates the XLA path (24 x 960 MB in DepthAnything vitl)
        from egoscaler_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal, q_offset=q_offset,
            kv_lengths=kv_lengths, scale=scale,
        )

    mask = None
    if causal:
        mask = make_causal_mask(s, t, q_offset)[None, None, :, :]
    if kv_lengths is not None:
        kv_mask = (jnp.arange(t)[None, :] < kv_lengths[:, None])[:, None, None, :]
        mask = kv_mask if mask is None else (mask & kv_mask)
    return xla_attention(q, k, v, mask=mask, scale=scale)


def causal_attention_with_kv_mask(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array],
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Full-sequence causal attention with an arbitrary (B, T) key mask —
    the LLaMA training/prefill path (mid-prompt pads).  Pallas flash on
    TPU, XLA elsewhere."""
    b, s, h, d = q.shape
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu" and d % 128 == 0 and s >= 128
        )
    if use_flash:
        from egoscaler_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=True, kv_mask=kv_mask)
    mask = make_causal_mask(s, s)[None, None]
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, None, :]
    return xla_attention(q, k, v, mask=mask)


# --------------------------------------------------------------------------
# Rotary position embeddings (LLaMA convention: rotate_half)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def rope_table(max_len: int, dim: int, theta: float = 10000.0):
    """Precompute (max_len, dim/2) cos/sin tables."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    pos = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)  # (L, dim/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               positions: jax.Array) -> jax.Array:
    """Rotate (B, S, H, D) by position.  positions: (B, S) int.

    HF LLaMA convention: the head dim is split in halves [x1, x2] and
    rotated as (x1 cos - x2 sin, x2 cos + x1 sin).
    """
    d2 = x.shape[-1] // 2
    c = cos[positions][:, :, None, :]  # (B, S, 1, D/2)
    s = sin[positions][:, :, None, :]
    x1, x2 = x[..., :d2], x[..., d2:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)
