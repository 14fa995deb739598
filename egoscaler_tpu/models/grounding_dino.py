"""Grounding-DINO (text-conditioned detection) in flax, TPU-first.

The reference's stage 6 runs `IDEA-Research/grounding-dino-base` through
HF transformers on GPU (6_get_bounding_box.py:130-135).  This module is
a JAX-native rebuild matching the HF implementation
(models/grounding_dino/modeling_grounding_dino.py) to fp32 tolerance so
converted checkpoints drop in:

* Swin backbone (models/swin.py) + 1x1/3x3 input projections with
  GroupNorm -> 4 feature levels;
* BERT text encoder with the special-token block-diagonal self-attention
  mask (generate_masks_with_special_tokens_and_transfer_map);
* feature-enhancer encoder: bi-directional vision<->text fusion
  attention + text self-attention + multi-scale deformable attention
  over the flattened level pyramid;
* language-guided query selection (two-stage: top-900 proposals by
  contrastive similarity with the text);
* cross-modality decoder with iterative box refinement;
* contrastive class head (query @ text^T) + 3-layer box MLP.

Deformable attention's CUDA grid_sample kernel becomes a gather-based
bilinear sampler (`bilinear_grid_sample`): one (2, 2)-block lax.gather
per sample over a zero-padded plane, weighted per level and accumulated
without materializing the level stack.

All shapes static under jit; images are assumed unpadded (pixel_mask of
ones — the pipeline feeds fixed-size frames), matching the HF default.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.gelu import gelu as pgelu

from egoscaler_tpu.models.swin import SwinBackbone, SwinConfig

# [CLS], [SEP], '.', '?' in the BERT vocab (modeling_grounding_dino.py:1860)
SPECIAL_TOKENS = (101, 102, 1012, 1029)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    def tiny(self) -> "BertConfig":
        # vocab must cover the BERT special-token ids (101/102/1012/1029)
        return dataclasses.replace(
            self, vocab_size=1100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
        )


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    d_model: int = 256
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    num_feature_levels: int = 4
    encoder_n_points: int = 4
    decoder_n_points: int = 4
    num_queries: int = 900
    max_text_len: int = 256
    positional_embedding_temperature: float = 20.0
    layer_norm_eps: float = 1e-5
    # dtype for the deformable-attention value tensor ("bfloat16" halves
    # the gather traffic of the encoder — the dominant cost at 800^2;
    # None keeps f32 for strict HF parity checks)
    deformable_value_dtype: Optional[str] = None
    backbone: SwinConfig = dataclasses.field(default_factory=SwinConfig)
    text: BertConfig = dataclasses.field(default_factory=BertConfig)

    def tiny(self) -> "GroundingDinoConfig":
        return dataclasses.replace(
            self,
            d_model=32,
            encoder_layers=2,
            decoder_layers=2,
            encoder_attention_heads=4,
            decoder_attention_heads=4,
            encoder_ffn_dim=64,
            decoder_ffn_dim=64,
            num_feature_levels=3,
            num_queries=20,
            max_text_len=32,
            backbone=SwinConfig().tiny(),
            text=BertConfig().tiny(),
        )


# ---------------------------------------------------------------------------
# Host-side text mask construction (modeling_grounding_dino.py:1866-1905)


def special_token_masks(input_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Block-diagonal self-attention mask between special tokens and
    per-phrase position ids.  Host numpy — text is tiny and data-dependent."""
    input_ids = np.asarray(input_ids)
    bsz, n = input_ids.shape
    special = np.isin(input_ids, SPECIAL_TOKENS)
    attention_mask = np.repeat(np.eye(n, dtype=bool)[None], bsz, axis=0)
    position_ids = np.zeros((bsz, n), np.int64)
    for row in range(bsz):
        previous_col = 0
        for col in np.nonzero(special[row])[0]:
            if col in (0, n - 1):
                attention_mask[row, col, col] = True
                position_ids[row, col] = 0
            else:
                attention_mask[
                    row, previous_col + 1 : col + 1, previous_col + 1 : col + 1
                ] = True
                position_ids[row, previous_col + 1 : col + 1] = np.arange(
                    0, col - previous_col
                )
            previous_col = col
    return attention_mask, position_ids


# ---------------------------------------------------------------------------
# Text backbone (HF BertModel, add_pooling_layer=False)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, additive_mask: jax.Array) -> jax.Array:
        c = self.cfg
        hd = c.hidden_size // c.num_attention_heads
        b, s, _ = x.shape

        def split(t):
            return t.reshape(b, s, c.num_attention_heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(c.hidden_size, name="query")(x))
        k = split(nn.Dense(c.hidden_size, name="key")(x))
        v = split(nn.Dense(c.hidden_size, name="value")(x))
        scores = jnp.einsum(
            "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        scores = scores + additive_mask
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhst,bhtd->bhsd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, additive_mask: jax.Array) -> jax.Array:
        c = self.cfg
        attn = BertSelfAttention(c, name="attention_self")(x, additive_mask)
        attn = nn.Dense(c.hidden_size, name="attention_output_dense")(attn)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="attention_output_LayerNorm"
        )(x + attn)
        h = nn.Dense(c.intermediate_size, name="intermediate_dense")(x)
        h = pgelu(h)
        h = nn.Dense(c.hidden_size, name="output_dense")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_LayerNorm")(x + h)


class BertTextEncoder(nn.Module):
    """HF BertModel equivalent supporting a (B, L, L) bool allow-mask."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        self_attention_masks: jax.Array,  # (B, L, L) bool, True = attend
        token_type_ids: jax.Array,
        position_ids: jax.Array,
    ) -> jax.Array:
        c = self.cfg
        words = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(
            input_ids
        )
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(position_ids)
        types = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings"
        )(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_LayerNorm")(
            words + pos + types
        )
        additive = jnp.where(
            self_attention_masks[:, None, :, :], 0.0, jnp.finfo(jnp.float32).min
        )
        for i in range(c.num_hidden_layers):
            x = BertLayer(c, name=f"layer_{i}")(x, additive)
        return x


# ---------------------------------------------------------------------------
# Position embeddings


def sine_position_embedding(
    h: int, w: int, embedding_dim: int, temperature: float
) -> jax.Array:
    """(h, w, 2*embedding_dim) DETR sine embedding for an all-valid mask
    (GroundingDinoSinePositionEmbedding.forward with ones pixel_mask)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + eps) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + eps) * scale
    dim_t = jnp.arange(embedding_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / embedding_dim)
    pos_x = x[:, None] / dim_t
    pos_y = y[:, None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[:, 0::2]), jnp.cos(pos_x[:, 1::2])], axis=2
    ).reshape(w, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[:, 0::2]), jnp.cos(pos_y[:, 1::2])], axis=2
    ).reshape(h, -1)
    pos = jnp.concatenate(
        [
            jnp.broadcast_to(pos_y[:, None, :], (h, w, embedding_dim)),
            jnp.broadcast_to(pos_x[None, :, :], (h, w, embedding_dim)),
        ],
        axis=-1,
    )
    return pos


def get_sine_pos_embed(
    pos: jax.Array, num_pos_feats: int, temperature: float = 10000.0,
    exchange_xy: bool = True,
) -> jax.Array:
    """(..., n) -> (..., n * num_pos_feats) (get_sine_pos_embed :1046)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    def sine(x):  # x: (..., 1)
        sin_x = x * scale / dim_t
        return jnp.stack(
            [jnp.sin(sin_x[..., 0::2]), jnp.cos(sin_x[..., 1::2])], axis=-1
        ).reshape(*x.shape[:-1], num_pos_feats)

    parts = [sine(pos[..., i : i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Multi-scale deformable attention


def bilinear_grid_sample(value: jax.Array, grid: jax.Array) -> jax.Array:
    """torch.nn.functional.grid_sample(align_corners=False, padding zeros).

    value: (B, H, W, C); grid: (B, Q, P, 2) in [-1, 1] (x, y).
    Returns (B, Q, P, C).

    One `lax.gather` of a (2, 2) corner block per sample instead of four
    per-corner gathers: the deformable encoder is gather-bound on TPU
    (Swin-B itself is ~6 ms while the encoder dominates the 800^2
    forward), and block gathers quarter the index count for the same
    bytes.  A one-pixel zero-pad ring keeps the clamped blocks exactly
    equivalent to per-corner clamp+mask semantics.
    """
    b, h, w, c = value.shape
    x = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    padded = jnp.pad(value, ((0, 0), (1, 1), (1, 1), (0, 0)))
    starts = jnp.stack(
        [jnp.clip(y0i + 1, 0, h), jnp.clip(x0i + 1, 0, w)], axis=-1
    ).reshape(b, -1, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_blocks(v, s):
        return jax.lax.gather(
            v, s, dimension_numbers=dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    blocks = jax.vmap(gather_blocks)(padded, starts)  # (B, N, 2, 2, C)
    blocks = blocks.reshape(*y0i.shape, 2, 2, c)

    # per-corner validity (zeros padding): only binds when the clamp on
    # the block start engaged (|y0| or |x0| beyond the pad ring)
    vx0 = (x0i >= 0) & (x0i <= w - 1)
    vx1 = (x0i >= -1) & (x0i <= w - 2)
    vy0 = (y0i >= 0) & (y0i <= h - 1)
    vy1 = (y0i >= -1) & (y0i <= h - 2)

    return (
        blocks[..., 0, 0, :] * ((vy0 & vx0) * wy0 * wx0)[..., None]
        + blocks[..., 0, 1, :] * ((vy0 & vx1) * wy0 * wx1)[..., None]
        + blocks[..., 1, 0, :] * ((vy1 & vx0) * wy1 * wx0)[..., None]
        + blocks[..., 1, 1, :] * ((vy1 & vx1) * wy1 * wx1)[..., None]
    )


def multi_scale_deformable_attention(
    value: jax.Array,                 # (B, S, heads, head_dim)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,    # (B, Q, heads, L, P, 2) in [0, 1]
    attention_weights: jax.Array,     # (B, Q, heads, L, P)
) -> jax.Array:
    """MultiScaleDeformableAttention.forward (:46-98) via gathers.

    Accumulates the weighted samples per level instead of stacking all
    (B*heads, Q, L, P, hd) samples — the stack is the largest
    intermediate of the encoder and never needs to materialize."""
    b, _, heads, hd = value.shape
    q = sampling_locations.shape[1]
    grids = 2 * sampling_locations - 1
    wts = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * heads, q, len(spatial_shapes), -1, 1
    )
    start = 0
    out = None
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w]  # (B, hw, heads, hd)
        v = v.transpose(0, 2, 1, 3).reshape(b * heads, h, w, hd)
        g = grids[:, :, :, lvl]  # (B, Q, heads, P, 2)
        g = g.transpose(0, 2, 1, 3, 4).reshape(b * heads, q, -1, 2)
        s = bilinear_grid_sample(v, g)  # (B*heads, Q, P, hd)
        contrib = (s * wts[:, :, lvl]).sum(axis=2)  # (B*heads, Q, hd)
        out = contrib if out is None else out + contrib
        start += h * w
    return out.reshape(b, heads, q, hd).transpose(0, 2, 1, 3).reshape(b, q, heads * hd)


class DeformableAttention(nn.Module):
    """GroundingDinoMultiscaleDeformableAttention (:516-623)."""

    cfg: GroundingDinoConfig
    num_heads: int
    n_points: int

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,           # (B, Q, D) queries
        encoder_hidden_states: jax.Array,   # (B, S, D) values
        position_embeddings: Optional[jax.Array],
        reference_points: jax.Array,        # (B, Q, L, 2 or 4)
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        c = self.cfg
        if position_embeddings is not None:
            hidden_states = hidden_states + position_embeddings
        b, q, _ = hidden_states.shape
        s = encoder_hidden_states.shape[1]
        n_levels = len(spatial_shapes)

        value = nn.Dense(c.d_model, name="value_proj")(encoder_hidden_states)
        if c.deformable_value_dtype is not None:
            value = value.astype(c.deformable_value_dtype)
        value = value.reshape(b, s, self.num_heads, c.d_model // self.num_heads)
        offsets = nn.Dense(
            self.num_heads * n_levels * self.n_points * 2, name="sampling_offsets"
        )(hidden_states).reshape(b, q, self.num_heads, n_levels, self.n_points, 2)
        weights = nn.Dense(
            self.num_heads * n_levels * self.n_points, name="attention_weights"
        )(hidden_states).reshape(b, q, self.num_heads, n_levels * self.n_points)
        weights = jax.nn.softmax(weights, axis=-1).reshape(
            b, q, self.num_heads, n_levels, self.n_points
        )

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[wl, hl] for hl, wl in spatial_shapes], jnp.float32
            )
            locations = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        else:
            locations = (
                reference_points[:, :, None, :, None, :2]
                + offsets / self.n_points
                * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        out = multi_scale_deformable_attention(
            value, spatial_shapes, locations, weights
        )
        return nn.Dense(c.d_model, name="output_proj")(out)


# ---------------------------------------------------------------------------
# Attention / fusion blocks


class MultiheadAttention(nn.Module):
    """GroundingDinoMultiheadAttention (:1159-1229)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, queries, keys, values, additive_mask=None):
        hd = self.d_model // self.num_heads
        b, sq, _ = queries.shape
        sk = keys.shape[1]

        def split(t, s):
            return t.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.d_model, name="query")(queries), sq)
        k = split(nn.Dense(self.d_model, name="key")(keys), sk)
        v = split(nn.Dense(self.d_model, name="value")(values), sk)
        scores = jnp.einsum(
            "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        if additive_mask is not None:
            scores = scores + additive_mask
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhst,bhtd->bhsd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(queries.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(out)


class TextEnhancerLayer(nn.Module):
    """GroundingDinoTextEnhancerLayer (:626-705)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, x, allow_mask, position_embeddings):
        c = self.cfg
        num_heads = c.encoder_attention_heads // 2
        additive = jnp.where(
            allow_mask[:, None, :, :], 0.0, jnp.finfo(jnp.float32).min
        )
        qk = x + position_embeddings
        attn = MultiheadAttention(
            c.d_model, num_heads, name="self_attn"
        )(qk, qk, x, additive)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm_before")(
            x + attn
        )
        h = nn.Dense(c.encoder_ffn_dim // 2, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm_after")(
            x + h
        )


class BiMultiHeadAttention(nn.Module):
    """GroundingDinoBiMultiHeadAttention (:708-857)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask):
        c = self.cfg
        embed_dim = c.encoder_ffn_dim // 2
        num_heads = c.encoder_attention_heads // 2
        hd = embed_dim // num_heads
        b, tv, _ = vision.shape
        tt = text.shape[1]
        scale = hd ** -0.5

        def split(t, s):
            return (
                t.reshape(b, s, num_heads, hd)
                .transpose(0, 2, 1, 3)
                .reshape(b * num_heads, s, hd)
            )

        vq = split(nn.Dense(embed_dim, name="vision_proj")(vision) * scale, tv)
        tk = split(nn.Dense(embed_dim, name="text_proj")(text), tt)
        vv = split(nn.Dense(embed_dim, name="values_vision_proj")(vision), tv)
        tv_states = split(nn.Dense(embed_dim, name="values_text_proj")(text), tt)

        attn = jnp.einsum(
            "bsd,btd->bst", vq, tk, preferred_element_type=jnp.float32
        )
        attn = attn - attn.max()
        attn = jnp.clip(attn, -50000, 50000)
        attn_t = attn.transpose(0, 2, 1)
        attn_t = attn_t - attn_t.max(axis=-1, keepdims=True)
        attn_t = jnp.clip(attn_t, -50000, 50000)

        # text->vision attention: no vision padding in our fixed-size path
        text_probs = jax.nn.softmax(attn_t, axis=-1)

        # vision->text: mask padded text tokens
        if text_pad_mask is not None:
            pad = jnp.repeat(text_pad_mask[:, None, None, :], num_heads, 1)
            pad = pad.reshape(b * num_heads, 1, tt)
            attn = jnp.where(pad, -jnp.inf, attn)
        vision_probs = jax.nn.softmax(attn, axis=-1)

        vision_out = jnp.einsum(
            "bst,btd->bsd", vision_probs.astype(tv_states.dtype), tv_states,
            preferred_element_type=jnp.float32,
        )
        text_out = jnp.einsum(
            "bts,bsd->btd", text_probs.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32,
        )
        vision_out = (
            vision_out.reshape(b, num_heads, tv, hd)
            .transpose(0, 2, 1, 3)
            .reshape(b, tv, embed_dim)
        ).astype(vision.dtype)
        text_out = (
            text_out.reshape(b, num_heads, tt, hd)
            .transpose(0, 2, 1, 3)
            .reshape(b, tt, embed_dim)
        ).astype(text.dtype)
        return (
            nn.Dense(c.d_model, name="out_vision_proj")(vision_out),
            nn.Dense(c.d_model, name="out_text_proj")(text_out),
        )


class FusionLayer(nn.Module):
    """GroundingDinoFusionLayer (:895-955); drop-path inactive at eval."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask):
        c = self.cfg
        vision = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="layer_norm_vision"
        )(vision)
        text = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm_text")(
            text
        )
        dv, dt = BiMultiHeadAttention(c, name="attn")(vision, text, text_pad_mask)
        vision_param = self.param(
            "vision_param", nn.initializers.constant(1e-4), (c.d_model,)
        )
        text_param = self.param(
            "text_param", nn.initializers.constant(1e-4), (c.d_model,)
        )
        return vision + vision_param * dv, text + text_param * dt


class DeformableLayer(nn.Module):
    """GroundingDinoDeformableLayer (:958-1040)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, x, position_embeddings, reference_points, spatial_shapes):
        c = self.cfg
        attn = DeformableAttention(
            c, c.encoder_attention_heads, c.encoder_n_points, name="self_attn"
        )(x, x, position_embeddings, reference_points, spatial_shapes)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="self_attn_layer_norm"
        )(x + attn)
        h = nn.relu(nn.Dense(c.encoder_ffn_dim, name="fc1")(x))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(
            x + h
        )


class EncoderLayer(nn.Module):
    """GroundingDinoEncoderLayer (:1079-1156)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(
        self,
        vision, text,
        vision_position_embedding,
        spatial_shapes,
        reference_points,
        text_pad_mask,                # (B, L) True = pad
        text_self_attention_masks,    # (B, L, L) True = attend
        text_position_ids,
    ):
        c = self.cfg
        text_pos = get_sine_pos_embed(
            text_position_ids[..., None].astype(jnp.float32),
            num_pos_feats=c.d_model, exchange_xy=False,
        )
        vision, text = FusionLayer(c, name="fusion_layer")(
            vision, text, text_pad_mask
        )
        text = TextEnhancerLayer(c, name="text_enhancer_layer")(
            text, text_self_attention_masks, text_pos
        )
        vision = DeformableLayer(c, name="deformable_layer")(
            vision, vision_position_embedding, reference_points, spatial_shapes
        )
        return vision, text


class DecoderLayer(nn.Module):
    """GroundingDinoDecoderLayer (:1231-1346)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(
        self,
        x,                      # (B, Q, D)
        query_pos,
        reference_points,       # (B, Q, L, 4)
        spatial_shapes,
        vision_states,
        text_states,
        text_additive_mask,     # (B, heads, Q, L) additive
    ):
        c = self.cfg
        qk = x + query_pos
        attn = MultiheadAttention(
            c.d_model, c.decoder_attention_heads, name="self_attn"
        )(qk, qk, x)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="self_attn_layer_norm"
        )(x + attn)

        attn = MultiheadAttention(
            c.d_model, c.decoder_attention_heads, name="encoder_attn_text"
        )(x + query_pos, text_states, text_states, text_additive_mask)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="encoder_attn_text_layer_norm"
        )(x + attn)

        attn = DeformableAttention(
            c, c.decoder_attention_heads, c.decoder_n_points, name="encoder_attn"
        )(x, vision_states, query_pos, reference_points, spatial_shapes)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="encoder_attn_layer_norm"
        )(x + attn)

        h = nn.relu(nn.Dense(c.decoder_ffn_dim, name="fc1")(x))
        h = nn.Dense(c.d_model, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(
            x + h
        )


class MLPPredictionHead(nn.Module):
    """GroundingDinoMLPPredictionHead (:2319-2337)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def contrastive_logits(
    vision_state: jax.Array, text_state: jax.Array, text_token_mask: jax.Array,
    max_text_len: int,
) -> jax.Array:
    """GroundingDinoContrastiveEmbedding (:1349-1368): query-text
    similarity, -inf at padded text, padded out to max_text_len."""
    logits = jnp.einsum(
        "bqd,btd->bqt", vision_state, text_state,
        preferred_element_type=jnp.float32,
    )
    logits = jnp.where(text_token_mask[:, None, :], logits, -jnp.inf)
    pad = max_text_len - logits.shape[-1]
    if pad > 0:
        logits = jnp.pad(
            logits, ((0, 0), (0, 0), (0, pad)), constant_values=-jnp.inf
        )
    return logits[..., :max_text_len]


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class GroundingDinoForDetection(nn.Module):
    """GroundingDinoForObjectDetection equivalent: (image, token ids) ->
    (logits (B, Q, max_text_len), pred_boxes (B, Q, 4) cxcywh in [0,1])."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(
        self,
        pixel_values: jax.Array,            # (B, H, W, 3), normalized
        input_ids: jax.Array,               # (B, L)
        token_type_ids: jax.Array,          # (B, L)
        text_token_mask: jax.Array,         # (B, L) bool, True = real
        text_self_attention_masks: jax.Array,  # (B, L, L) bool, True = attend
        position_ids: jax.Array,            # (B, L)
    ) -> Dict[str, jax.Array]:
        c = self.cfg
        b = pixel_values.shape[0]

        # --- text path
        text_features = BertTextEncoder(c.text, name="text_backbone")(
            input_ids, text_self_attention_masks, token_type_ids, position_ids
        )
        text_features = nn.Dense(c.d_model, name="text_projection")(text_features)

        # --- vision path: backbone + input projections -> 4 levels
        backbone_feats = SwinBackbone(c.backbone, name="backbone")(pixel_values)
        feature_maps: List[jax.Array] = []
        for lvl, feat in enumerate(backbone_feats):
            x = nn.Conv(
                c.d_model, (1, 1), name=f"input_proj_vision_{lvl}_conv"
            )(feat)
            x = nn.GroupNorm(
                num_groups=32 if c.d_model % 32 == 0 else 8, epsilon=1e-5,
                name=f"input_proj_vision_{lvl}_norm",
            )(x)
            feature_maps.append(x)
        for lvl in range(len(backbone_feats), c.num_feature_levels):
            src = backbone_feats[-1] if lvl == len(backbone_feats) else feature_maps[-1]
            x = nn.Conv(
                c.d_model, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                name=f"input_proj_vision_{lvl}_conv",
            )(src)
            x = nn.GroupNorm(
                num_groups=32 if c.d_model % 32 == 0 else 8, epsilon=1e-5,
                name=f"input_proj_vision_{lvl}_norm",
            )(x)
            feature_maps.append(x)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (c.num_feature_levels, c.d_model),
        )
        spatial_shapes = [(f.shape[1], f.shape[2]) for f in feature_maps]
        sources, pos_embeds = [], []
        for lvl, f in enumerate(feature_maps):
            h, w = spatial_shapes[lvl]
            sources.append(f.reshape(b, h * w, c.d_model))
            pos = sine_position_embedding(
                h, w, c.d_model // 2, c.positional_embedding_temperature
            ).reshape(1, h * w, c.d_model)
            pos_embeds.append(pos + level_embed[lvl][None, None])
        source_flatten = jnp.concatenate(sources, axis=1)   # (B, S, D)
        pos_flatten = jnp.concatenate(pos_embeds, axis=1)

        # encoder reference points (valid_ratios = 1)
        ref_list = []
        for h, w in spatial_shapes:
            ry = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            rx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            grid = jnp.stack(
                [
                    jnp.broadcast_to(rx[None, :], (h, w)),
                    jnp.broadcast_to(ry[:, None], (h, w)),
                ],
                axis=-1,
            ).reshape(h * w, 2)
            ref_list.append(grid)
        enc_ref = jnp.concatenate(ref_list, axis=0)  # (S, 2)
        enc_ref = jnp.broadcast_to(
            enc_ref[None, :, None, :], (b, enc_ref.shape[0], len(spatial_shapes), 2)
        )

        text_pad_mask = ~text_token_mask
        vision, text = source_flatten, text_features
        for i in range(c.encoder_layers):
            vision, text = EncoderLayer(c, name=f"encoder_layers_{i}")(
                vision, text, pos_flatten, spatial_shapes, enc_ref,
                text_pad_mask, text_self_attention_masks, position_ids,
            )

        # --- two-stage query selection (GroundingDinoModel:1999-2040,2255)
        proposals = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            gy = jnp.arange(h, dtype=jnp.float32)
            gx = jnp.arange(w, dtype=jnp.float32)
            grid = jnp.stack(
                [
                    jnp.broadcast_to(gx[None, :], (h, w)),
                    jnp.broadcast_to(gy[:, None], (h, w)),
                ],
                axis=-1,
            )
            scale = jnp.asarray([w, h], jnp.float32)
            grid = (grid + 0.5) / scale
            wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
            proposals.append(
                jnp.concatenate([grid, wh], axis=-1).reshape(h * w, 4)
            )
        output_proposals = jnp.concatenate(proposals, axis=0)[None]  # (1, S, 4)
        valid = jnp.all(
            (output_proposals > 0.01) & (output_proposals < 0.99), -1, keepdims=True
        )
        output_proposals = jnp.log(output_proposals / (1 - output_proposals))
        output_proposals = jnp.where(valid, output_proposals, jnp.inf)
        output_proposals = jnp.broadcast_to(
            output_proposals, (b, *output_proposals.shape[1:])
        )

        object_query = jnp.where(valid, vision, 0.0)
        object_query = nn.Dense(c.d_model, name="enc_output")(object_query)
        object_query = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="enc_output_norm"
        )(object_query)

        enc_logits = contrastive_logits(
            object_query, text, text_token_mask, c.max_text_len
        )
        delta_bbox = MLPPredictionHead(
            c.d_model, 4, name="encoder_output_bbox_embed"
        )(object_query)
        enc_coord_logits = delta_bbox + output_proposals

        topk_scores = jnp.max(
            jnp.where(jnp.isfinite(enc_logits), enc_logits, -jnp.inf), axis=-1
        )
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)
        topk_coords = jnp.take_along_axis(
            enc_coord_logits, topk_idx[..., None], axis=1
        )
        reference_points = jax.nn.sigmoid(topk_coords)
        init_reference_points = reference_points

        query_embeds = self.param(
            "query_position_embeddings", nn.initializers.normal(1.0),
            (c.num_queries, c.d_model),
        )
        target = jnp.broadcast_to(
            query_embeds[None], (b, c.num_queries, c.d_model)
        )

        # --- decoder with iterative box refinement
        bbox_head = MLPPredictionHead(c.d_model, 4, name="bbox_embed")
        text_additive = jnp.where(
            text_token_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min
        )
        text_additive = jnp.broadcast_to(
            text_additive,
            (b, c.decoder_attention_heads, c.num_queries, text_token_mask.shape[1]),
        )

        x = target
        intermediate = []
        intermediate_refs = []
        decoder_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, name="decoder_layer_norm")
        ref_head = MLPPredictionHead(
            c.d_model, c.d_model, num_layers=2, name="reference_points_head"
        )
        for i in range(c.decoder_layers):
            ref_input = reference_points[:, :, None, :]  # valid_ratios = 1
            ref_input = jnp.broadcast_to(
                ref_input, (b, c.num_queries, len(spatial_shapes), 4)
            )
            query_pos = ref_head(
                get_sine_pos_embed(ref_input[:, :, 0, :], c.d_model // 2)
            )
            x = DecoderLayer(c, name=f"decoder_layers_{i}")(
                x, query_pos, ref_input, spatial_shapes, vision, text,
                text_additive,
            )
            delta = bbox_head(x)
            reference_points = jax.nn.sigmoid(
                delta + _inverse_sigmoid(reference_points)
            )
            intermediate.append(decoder_norm(x))
            intermediate_refs.append(reference_points)

        # --- heads on the final layer (ForObjectDetection:2558-2583)
        last = intermediate[-1]
        logits = contrastive_logits(last, text, text_token_mask, c.max_text_len)
        reference = (
            init_reference_points
            if c.decoder_layers == 1
            else intermediate_refs[-2]
        )
        delta = bbox_head(last)
        pred_boxes = jax.nn.sigmoid(delta + _inverse_sigmoid(reference))

        return {
            "logits": logits,
            "pred_boxes": pred_boxes,
            "encoder_logits": enc_logits,
            "init_reference_points": init_reference_points,
            "last_hidden_state": last,
        }


def post_process_detection(
    logits: np.ndarray,
    pred_boxes: np.ndarray,
    image_size: Tuple[int, int],
    box_threshold: float = 0.3,
) -> List[Dict[str, np.ndarray]]:
    """HF post_process_grounded_object_detection equivalent: sigmoid
    scores, (cx, cy, w, h) -> absolute (x0, y0, x1, y1)."""
    h, w = image_size
    results = []
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
    probs = np.nan_to_num(probs, nan=0.0)
    for b in range(probs.shape[0]):
        scores = probs[b].max(axis=-1)
        keep = scores > box_threshold
        cxcywh = np.asarray(pred_boxes[b][keep])
        xyxy = np.stack(
            [
                (cxcywh[:, 0] - cxcywh[:, 2] / 2) * w,
                (cxcywh[:, 1] - cxcywh[:, 3] / 2) * h,
                (cxcywh[:, 0] + cxcywh[:, 2] / 2) * w,
                (cxcywh[:, 1] + cxcywh[:, 3] / 2) * h,
            ],
            axis=-1,
        ) if keep.any() else np.zeros((0, 4))
        results.append({"scores": scores[keep], "boxes": xyxy})
    return results
