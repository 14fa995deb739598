"""TrajPointLLM: PointBERT + projector + LLaMA with trajectory tokens.

Rebuild of the reference fusion model
(models/pointllm/pointllm/model/pointllm.py:26-353 + model_arch.py:8-123
+ builder.py:10-55):

* point features from PointBERT -> 3-layer projector MLP
  (384 -> 1024 -> 2048 -> 4096 w/ GELU, pointllm.py:63-82);
* **vectorized embedding splice**: instead of the reference's per-sample
  python loop over <point_patch> spans (pointllm.py:134-171), the patch
  positions are located with a cumsum gather — fully jittable for
  arbitrary splice positions, no dynamic shapes;
* extended vocabulary: base 32003 + 3 timestep + num_bins RT-2 tokens
  (builder.py:33-46); embed_tokens/lm_head carry the extended size;
* `generate`: prefill + lax.scan KV-cache decode with temperature /
  top-k / top-p sampling matching model_arch.py:77-108 defaults.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.gelu import gelu as pgelu

from egoscaler_tpu.configs import PointLLMConfig
from egoscaler_tpu.models.llama import LlamaModel, init_kv_cache, make_dense
from egoscaler_tpu.models.pointbert import PointTransformer


class PointProjector(nn.Module):
    """point_proj MLP (pointllm.py:63-82), names proj_{0,2,4} matching
    the torch nn.Sequential indices."""

    hidden_dims: Tuple[int, ...]
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.hidden_dims):
            x = nn.Dense(d, name=f"proj_{2 * i}")(x)
            x = pgelu(x)
        return nn.Dense(self.out_dim, name=f"proj_{2 * len(self.hidden_dims)}")(x)


class TrajPointLLM(nn.Module):
    """The flagship model: point cloud + token ids -> next-token logits."""

    cfg: PointLLMConfig
    remat: bool = True

    def setup(self):
        cfg = self.cfg
        self.point_backbone = PointTransformer(cfg.point_bert, name="point_backbone")
        self.point_proj = PointProjector(
            hidden_dims=cfg.point_bert.projection_hidden_dims,
            out_dim=cfg.llama.hidden_size,
            name="point_proj",
        )
        self.embed_tokens = nn.Embed(
            cfg.extended_vocab_size, cfg.llama.hidden_size, name="embed_tokens"
        )
        self.layers = LlamaModel(cfg.llama, remat=self.remat, name="model")
        # lm_head follows the trunk's weight_quant: at decode it is the
        # single largest weight read per step (extended_vocab x hidden)
        self.lm_head = make_dense(
            cfg.llama, cfg.extended_vocab_size, "lm_head"
        )

    def encode_points(self, point_clouds: jax.Array, train: bool = False):
        """(B, N, 6) normalized pc -> (B, point_token_len, hidden)."""
        feats = self.point_backbone(point_clouds, train=train)
        return self.point_proj(feats)

    def splice_point_embeds(
        self,
        input_ids: jax.Array,
        embeds: jax.Array,
        point_feats: jax.Array,
    ) -> jax.Array:
        """Replace <point_patch> token embeddings with point features.

        Vectorized equivalent of pointllm.py:158-170: positions of patch
        tokens (assumed consecutive, as the reference asserts) index into
        point_feats via a running count.
        """
        patch = input_ids == self.cfg.point_patch_token_id
        idx = jnp.cumsum(patch.astype(jnp.int32), axis=1) - 1
        idx = jnp.clip(idx, 0, point_feats.shape[1] - 1)
        gathered = jnp.take_along_axis(
            point_feats, idx[..., None], axis=1
        )
        return jnp.where(patch[..., None], gathered.astype(embeds.dtype), embeds)

    def __call__(
        self,
        input_ids: jax.Array,
        point_clouds: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """Full-sequence forward -> logits (B, S, V)."""
        embeds = self.embed_tokens(input_ids)
        if point_clouds is not None:
            pf = self.encode_points(point_clouds, train=train)
            embeds = self.splice_point_embeds(input_ids, embeds, pf)
        positions = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1]), input_ids.shape
        )
        x, _ = self.layers(embeds, positions, kv_mask=attention_mask)
        return self.lm_head(x)

    # ---- generation ----

    def prefill(
        self,
        input_ids: jax.Array,
        point_clouds: Optional[jax.Array],
        attention_mask: jax.Array,
        cache: Dict[str, jax.Array],
    ):
        """Run the prompt through the model, filling the cache.

        Returns (logits_last (B, V), cache).  The prompt occupies cache
        slots [0, P); `attention_mask` is (B, T_max) with the prompt part
        set (False on pad positions mid-prompt).
        """
        embeds = self.embed_tokens(input_ids)
        if point_clouds is not None:
            pf = self.encode_points(point_clouds)
            embeds = self.splice_point_embeds(input_ids, embeds, pf)
        p = input_ids.shape[1]
        positions = jnp.broadcast_to(jnp.arange(p), input_ids.shape)
        x, cache = self.layers(
            embeds, positions, kv_mask=attention_mask,
            cache=cache, cache_index=jnp.asarray(0, jnp.int32),
        )
        return self.lm_head(x[:, -1]), cache

    def decode_step(
        self,
        token: jax.Array,            # (B,) int32
        cache_index: jax.Array,      # int32: write slot — scalar, or (B,)
                                     # per-slot positions (serving engine)
        attention_mask: jax.Array,   # (B, T_max)
        cache: Dict[str, jax.Array],
    ):
        embeds = self.embed_tokens(token[:, None])
        cache_index = jnp.asarray(cache_index, jnp.int32)  # accept host ints
        if cache_index.ndim == 0:
            positions = jnp.broadcast_to(
                cache_index[None, None], (token.shape[0], 1)
            ).astype(jnp.int32)
        else:
            positions = cache_index[:, None]
        x, cache = self.layers(
            embeds, positions, kv_mask=attention_mask,
            cache=cache, cache_index=cache_index,
        )
        return self.lm_head(x[:, -1]), cache


    def decode_chunk(
        self,
        tokens: jax.Array,           # (B, S) int32 — small S (spec verify)
        cache_index: jax.Array,      # (B,) per-row first write slot
        attention_mask: jax.Array,   # (B, T_max)
        cache: Dict[str, jax.Array],
    ):
        """Verify-chunk forward for speculative decoding: run S tokens
        per row starting at per-row cache positions, returning ALL
        logits (B, S, V).  Row b's tokens occupy cache slots
        cache_index[b] + [0, S); stale speculative slots beyond the
        accepted prefix are overwritten by the next chunk."""
        b, s = tokens.shape
        embeds = self.embed_tokens(tokens)
        cache_index = jnp.asarray(cache_index, jnp.int32)
        positions = cache_index[:, None] + jnp.arange(s, dtype=jnp.int32)
        x, cache = self.layers(
            embeds, positions, kv_mask=attention_mask,
            cache=cache, cache_index=cache_index,
        )
        return self.lm_head(x), cache


def sample_token(
    logits: jax.Array,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 50,
    top_p: float = 0.95,
    do_sample: bool = True,
) -> jax.Array:
    """HF-style sampling (model_arch.py:83-88 defaults).

    With both top-k and top-p active (the default), the top-p cutoff is
    computed inside the k top-k values instead of sorting the full
    vocabulary — semantically identical (tokens below the k-th logit are
    filtered to -1e30 either way, and their ~0 probabilities cannot move
    the cumulative cutoff), and it removes a 32k-wide per-step sort that
    dominated decode cost (19 of 21.5 ms/step at 1.1B bs8 on v5e)."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(temperature, 1e-6)
    if 0 < top_k < logits.shape[-1]:
        vals = jax.lax.top_k(logits, top_k)[0]  # (B, k), descending
        kth = vals[..., -1:]
        if top_p < 1.0:
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # keep tokens until cumulative prob exceeds top_p (1st always kept)
            cutoff_mask = cum - probs > top_p
            cutoff_logit = jnp.min(
                jnp.where(cutoff_mask, jnp.inf, vals), axis=-1, keepdims=True
            )
            kth = jnp.maximum(kth, cutoff_logit)
        logits = jnp.where(logits < kth, -1e30, logits)
    elif top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_mask = cum - probs > top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff_logit, -1e30, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 160
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 0.95
    do_sample: bool = True
    eos_token_id: int = 2  # LLaMA </s>


def generate(
    model: TrajPointLLM,
    params: Any,
    input_ids: jax.Array,        # (B, P) right-padded prompt
    attention_mask: jax.Array,   # (B, P) bool
    point_clouds: Optional[jax.Array],
    key: jax.Array,
    gen: GenerateConfig = GenerateConfig(),
    cache_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Autoregressive generation with static shapes.

    Returns (tokens (B, max_new_tokens), lengths (B,)).  Generation stops
    contributing after eos (tokens after eos are pad = eos).
    """
    b, p = input_ids.shape
    t_max = p + gen.max_new_tokens
    cache = init_kv_cache(model.cfg.llama, b, t_max, cache_dtype)
    full_mask = jnp.concatenate(
        [attention_mask.astype(bool),
         jnp.ones((b, gen.max_new_tokens), bool)], axis=1
    )

    logits, cache = model.apply(
        params, input_ids, point_clouds, full_mask, cache,
        method=TrajPointLLM.prefill,
    )
    key, sub = jax.random.split(key)
    tok0 = sample_token(
        logits, sub, gen.temperature, gen.top_k, gen.top_p, gen.do_sample
    )

    def step(carry, i):
        tok, cache, key, done = carry
        key, sub = jax.random.split(key)
        logits, cache = model.apply(
            params, tok, p + i, full_mask, cache,
            method=TrajPointLLM.decode_step,
        )
        nxt = sample_token(
            logits, sub, gen.temperature, gen.top_k, gen.top_p, gen.do_sample
        )
        nxt = jnp.where(done, gen.eos_token_id, nxt)
        done = done | (nxt == gen.eos_token_id)
        emitted = jnp.where(done & (tok == gen.eos_token_id), gen.eos_token_id, tok)
        return (nxt, cache, key, done), tok

    done0 = tok0 == gen.eos_token_id
    (last, cache, key, done), toks = jax.lax.scan(
        step,
        (tok0, cache, key, done0),
        jnp.arange(gen.max_new_tokens, dtype=jnp.int32),
    )
    tokens = jnp.swapaxes(toks, 0, 1)  # (B, max_new)
    is_eos = tokens == gen.eos_token_id
    lengths = jnp.where(
        jnp.any(is_eos, axis=1),
        jnp.argmax(is_eos, axis=1),
        gen.max_new_tokens,
    )
    return tokens, lengths
