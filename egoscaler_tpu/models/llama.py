"""LLaMA decoder in flax, TPU-first.

Rebuild of the reference's HF LLaMA usage (transformers LlamaModel inside
PointLLMLlamaModel — models/pointllm/pointllm/model/pointllm.py:26-178)
as an explicit, jit-friendly decoder:

* functional KV cache (a pytree passed in/out — no mutable state), so
  prefill + `lax.scan` decode compile to two XLA programs with static
  shapes (SURVEY.md §7 hard part (e));
* attention via ops.attention (Pallas flash kernel on TPU; general
  (B, T) key-padding masks supported for mid-sequence pads — the
  reference right-pads description tokens mid-prompt, dataset.py:150-194);
* rotary embeddings in HF convention so converted checkpoints match;
* layers wrapped in `jax.checkpoint` (remat) during training to trade
  FLOPs for HBM (replaces DeepSpeed activation tricks).

Weight layout mirrors HF names (q_proj/k_proj/v_proj/o_proj,
gate_proj/up_proj/down_proj, input_layernorm, post_attention_layernorm)
for the torch->jax converter.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.configs import LlamaConfig
from egoscaler_tpu.ops.attention import (
    apply_rope,
    rope_table,
    xla_attention,
)

KVCache = Dict[str, jax.Array]  # {"k": (L, B, T, H, D), "v": ...}


class QuantDense(nn.Module):
    """Drop-in Dense(use_bias=False) serving int8 weights + per-channel
    scales through the Pallas w8a16 kernel (ops/quant_matmul.py).

    Params: kernel_q (K, N) int8, scale (N,) f32 — produced from a
    trained Dense kernel by models/quantize.quantize_decode_params.
    Inference-only (decode is where the bandwidth win is); training
    keeps bf16 Dense.
    """

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from egoscaler_tpu.ops.quant_matmul import quant_matmul_diff

        k = x.shape[-1]
        q = self.param(
            "kernel_q",
            lambda _, shape: jnp.zeros(shape, jnp.int8),
            (k, self.features),
        )
        s = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        # quant_matmul with an activation VJP: inference is the plain
        # kernel; under jax.grad the loss differentiates THROUGH the
        # int8 layer (frozen-trunk training, weights get no gradient)
        y = quant_matmul_diff(x.reshape(-1, k), q, s)
        return y.reshape(*x.shape[:-1], self.features)


def make_dense(cfg: LlamaConfig, features: int, name: str) -> nn.Module:
    """Dense or QuantDense per cfg.weight_quant (decode serving path).
    weight_quant="int8_trunk" quantizes only the layer projections and
    keeps lm_head a trainable bf16 Dense (the frozen-trunk training
    recipe — models/quantize.quantize_decode_params(trunk_only=True))."""
    if cfg.weight_quant == "int8" or (
        cfg.weight_quant == "int8_trunk" and name != "lm_head"
    ):
        return QuantDense(features, name=name)
    assert cfg.weight_quant in (None, "int8_trunk"), cfg.weight_quant
    return nn.Dense(features, use_bias=False, name=name)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return (x * w).astype(dtype)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    layer_idx: int = 0

    def _write_cache(self, cache, k, v, cache_index, b, s):
        """Write this step's k/v into the stacked cache (bf16 or KV8)."""
        quant = "k_scale" in cache
        if quant:
            from egoscaler_tpu.ops.kv8_attention import quantize_kv

            k_w, ks_w = quantize_kv(k)  # (B, s, KVH, D) int8, (B, s, KVH)
            v_w, vs_w = quantize_kv(v)
        else:
            k_w, v_w = k.astype(cache["k"].dtype), v.astype(cache["v"].dtype)
        li = self.layer_idx
        out = dict(cache)
        if cache_index.ndim == 0:
            # one small dynamic_update_slice per layer at
            # (layer, 0, cache_index, ...) — no whole-cache copies
            # (in-place under the scan carry)
            out["k"] = jax.lax.dynamic_update_slice(
                cache["k"], k_w[None], (li, 0, cache_index, 0, 0)
            )
            out["v"] = jax.lax.dynamic_update_slice(
                cache["v"], v_w[None], (li, 0, cache_index, 0, 0)
            )
            if quant:
                out["k_scale"] = jax.lax.dynamic_update_slice(
                    cache["k_scale"], ks_w[None], (li, 0, cache_index, 0)
                )
                out["v_scale"] = jax.lax.dynamic_update_slice(
                    cache["v_scale"], vs_w[None], (li, 0, cache_index, 0)
                )
        else:
            # continuous batching (serving/engine.py) and speculative
            # verify chunks (serving/speculative.py): cache_index is
            # (B,) — every row reads/writes at its OWN position.  The
            # s tokens of row b land at slots cache_index[b] + [0, s);
            # one scatter per layer, still no whole-cache copies.
            bidx = jnp.arange(b)[:, None]
            rows = cache_index[:, None] + jnp.arange(s)[None, :]
            out["k"] = cache["k"].at[li, bidx, rows].set(k_w)
            out["v"] = cache["v"].at[li, bidx, rows].set(v_w)
            if quant:
                out["k_scale"] = cache["k_scale"].at[li, bidx, rows].set(ks_w)
                out["v_scale"] = cache["v_scale"].at[li, bidx, rows].set(vs_w)
        return out

    def _cache_kv_full(self, cache, expand_kv, dtype):
        """This layer's cache slice as bf16 (dequantized if KV8)."""
        li = self.layer_idx
        if "k_scale" in cache:
            from egoscaler_tpu.ops.kv8_attention import dequantize_kv

            k_full = dequantize_kv(cache["k"][li], cache["k_scale"][li], dtype)
            v_full = dequantize_kv(cache["v"][li], cache["v_scale"][li], dtype)
        else:
            k_full, v_full = cache["k"][li], cache["v"][li]
        return expand_kv(k_full), expand_kv(v_full)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        positions: jax.Array,
        kv_mask: Optional[jax.Array],
        cache: Optional[Dict[str, jax.Array]],
        cache_index: Optional[jax.Array],
    ) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
        cfg = self.cfg
        b, s, _ = x.shape
        h, hd = cfg.num_attention_heads, cfg.head_dim
        kvh = cfg.num_key_value_heads
        q = make_dense(cfg, h * hd, "q_proj")(x).reshape(b, s, h, hd)
        # GQA (LLaMA-2/3 70B, modeling_llama.py repeat_kv): k/v carry only
        # num_key_value_heads; the cache stays at kvh heads (h/kvh smaller)
        # and heads are repeated right before the attention contraction
        k = make_dense(cfg, kvh * hd, "k_proj")(x).reshape(b, s, kvh, hd)
        v = make_dense(cfg, kvh * hd, "v_proj")(x).reshape(b, s, kvh, hd)

        cos, sin = rope_table(cfg.max_position_embeddings, hd, cfg.rope_theta)
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)

        def expand_kv(t):
            if kvh == h:
                return t
            return jnp.repeat(t, h // kvh, axis=2)

        if cache is not None:
            quant = "k_scale" in cache
            cache = self._write_cache(cache, k, v, cache_index, b, s)
            if cache_index.ndim == 0 and s > 1:
                # prefill: causal attention over the prompt itself equals
                # attention over the cache (future slots are causally
                # masked) — run the Pallas flash kernel, no S^2 buffer
                from egoscaler_tpu.ops.attention import (
                    causal_attention_with_kv_mask,
                )

                pm = kv_mask[:, :s] if kv_mask is not None else None
                out = causal_attention_with_kv_mask(
                    q, expand_kv(k), expand_kv(v), pm
                )
            elif s == 1 and quant:
                # single-token decode over the int8 cache: the Pallas
                # flash-decode kernel dequantizes blocks in VMEM — the
                # cache streams at half the bf16 bytes
                # (ops/kv8_attention.py)
                from egoscaler_tpu.ops.kv8_attention import (
                    decode_attention_kv8,
                )

                li = self.layer_idx
                t = cache["k"].shape[2]
                pos = (
                    jnp.broadcast_to(cache_index, (b,))
                    if cache_index.ndim == 0 else cache_index
                )
                keymask = jnp.arange(t)[None, :] <= pos[:, None]  # (B, T)
                if kv_mask is not None:
                    keymask = keymask & kv_mask[:, :t]
                out = decode_attention_kv8(
                    q[:, 0], cache["k"][li], cache["k_scale"][li],
                    cache["v"][li], cache["v_scale"][li], keymask,
                )[:, None]  # (B, H, D) -> (B, 1, H, D)
            else:
                # decode/verify over the full cache slice via XLA
                # (bf16 cache; or the KV8 multi-token fallback, which
                # dequantizes through HBM — spec verify only)
                k_full, v_full = self._cache_kv_full(cache, expand_kv, q.dtype)
                t = k_full.shape[1]
                if cache_index.ndim == 0:
                    q_pos = cache_index + jnp.arange(s)
                    causal = (
                        jnp.arange(t)[None, :] <= q_pos[:, None]
                    )[None, None]
                else:
                    rows = cache_index[:, None] + jnp.arange(s)[None, :]
                    # (B, s) per-row query positions -> (B, 1, s, T)
                    causal = (
                        jnp.arange(t)[None, None, :] <= rows[:, :, None]
                    )[:, None]
                mask = causal
                if kv_mask is not None:
                    mask = mask & kv_mask[:, None, None, :t]
                out = xla_attention(q, k_full, v_full, mask=mask)
        else:
            # full-sequence training forward: Pallas flash (fwd + fused
            # bwd pair) via the dispatcher.  Honest per-step timing at
            # 1.1B bs8 S=678 under remat: flash 323 ms vs XLA 338 ms
            # (the earlier "XLA wins" readings predate the bf16-matmul +
            # head-packed kernel and used relay-flaky timing); flash also
            # keeps O(S) memory for long-context configs.
            from egoscaler_tpu.ops.attention import (
                causal_attention_with_kv_mask,
            )

            out = causal_attention_with_kv_mask(
                q, expand_kv(k), expand_kv(v), kv_mask
            )
        out = out.reshape(b, s, h * hd)
        out = make_dense(cfg, cfg.hidden_size, "o_proj")(out)
        return out, cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        gate = make_dense(cfg, cfg.intermediate_size, "gate_proj")(x)
        up = make_dense(cfg, cfg.intermediate_size, "up_proj")(x)
        return make_dense(cfg, cfg.hidden_size, "down_proj")(
            nn.silu(gate) * up
        )


class LlamaDecoderLayer(nn.Module):
    cfg: LlamaConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, positions, kv_mask, cache, cache_index):
        h, cache = LlamaAttention(self.cfg, self.layer_idx, name="self_attn")(
            RMSNorm(self.cfg.rms_norm_eps, name="input_layernorm")(x),
            positions, kv_mask, cache, cache_index,
        )
        x = x + h
        h = LlamaMLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.rms_norm_eps, name="post_attention_layernorm")(x)
        )
        return x + h, cache


class LlamaModel(nn.Module):
    """Decoder stack operating on input embeddings.

    Token embedding lives in the fused PointLLM wrapper (it owns the
    extended trajectory vocabulary); this module is purely the layers.
    """

    cfg: LlamaConfig
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jax.Array,
        positions: jax.Array,
        kv_mask: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        cache_index: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        x = inputs_embeds
        layer_cls = LlamaDecoderLayer
        if self.remat and cache is None:
            layer_cls = nn.remat(
                LlamaDecoderLayer, static_argnums=(), prevent_cse=False
            )
        # the FULL stacked cache dict threads through every layer; each
        # layer writes only its own (1, B, s, H, D) slice — no
        # whole-cache copies per decode step (stacking fresh per-layer
        # arrays cost ~1.4 GB/step at flagship size)
        for i in range(self.cfg.num_hidden_layers):
            x, cache = layer_cls(self.cfg, i, name=f"layers_{i}")(
                x, positions, kv_mask, cache, cache_index
            )
        x = RMSNorm(self.cfg.rms_norm_eps, name="norm")(x)
        return x, cache


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (
        cfg.num_hidden_layers, batch, max_len,
        cfg.num_key_value_heads, cfg.head_dim,  # GQA: kvh-head cache
    )
    if cfg.kv_quant == "int8":
        # KV8: int8 cache + per-(token, head) f32 scales
        # (ops/kv8_attention.py); `dtype` governs only the bf16 path
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        }
    assert cfg.kv_quant is None, cfg.kv_quant
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
