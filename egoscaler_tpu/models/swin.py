"""Swin Transformer backbone in flax (NHWC, TPU-first).

Grounding-DINO's vision backbone (reference stage 6 uses
`IDEA-Research/grounding-dino-base` = Swin-B, 6_get_bounding_box.py:130).
Rebuilt against the HF implementation (transformers
models/swin/modeling_swin.py) so converted checkpoints are
fp32-equivalent:

* patch embed: conv k=patch stride=patch + LayerNorm;
* stages of window-attention blocks — relative position bias from a
  learned table indexed by a static relative-coordinate map, alternating
  shifted windows (cyclic roll + cross-boundary mask);
* patch merging (2x2 concat -> LayerNorm -> linear 4C->2C) between stages;
* backbone mode: per-out-stage LayerNorm on the pre-downsample hidden
  state (SwinBackbone.forward, `always_partition=True`).

All tensors are NHWC; window partitioning is reshape/transpose only, so
XLA keeps everything fused.  Param names mirror the torch module tree
for the converter (models/convert.py convert_swin_backbone).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.gelu import gelu as pgelu


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    # 1-based stage numbers to emit (HF out_features ["stage2","stage3",
    # "stage4"] for grounding-dino-base)
    out_stages: Tuple[int, ...] = (2, 3, 4)

    def tiny(self) -> "SwinConfig":
        return dataclasses.replace(
            self,
            embed_dim=16,
            depths=(1, 2),
            num_heads=(2, 2),
            window_size=4,
            out_stages=(1, 2),
        )

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2**i for i in range(len(self.depths)))

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return tuple(self.stage_dims[s - 1] for s in self.out_stages)


def relative_position_index(window: int) -> np.ndarray:
    """Static (win^2, win^2) index into the (2w-1)^2 bias table
    (modeling_swin.py SwinSelfAttention.__init__)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0).astype(np.int32)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B * H/w * W/w, w*w, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """(num_windows*B, w*w, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    x = x.reshape(-1, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


def shifted_window_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Cross-boundary additive mask for SW-MSA (SwinLayer.get_attn_mask):
    (num_windows, w*w, w*w) with 0 inside a region and -100 across."""
    img = np.zeros((h, w), np.float32)
    slices = (
        slice(0, -window),
        slice(-window, -shift),
        slice(-shift, None),
    )
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    windows = img.reshape(h // window, window, w // window, window)
    windows = windows.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinSelfAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray]) -> jax.Array:
        """x: (num_windows*B, n, C); mask: (num_windows, n, n) additive."""
        bw, n, c = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, name="query")(x)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, name="key")(x)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, name="value")(x)
        q = q.reshape(bw, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bw, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bw, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        scores = scores + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(bw // nw, nw, self.num_heads, n, n)
            scores = scores + jnp.asarray(mask)[None, :, None]
            scores = scores.reshape(bw, self.num_heads, n, n)

        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return out.transpose(0, 2, 1, 3).reshape(bw, n, c)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    num_heads: int
    shift: int

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        cfg = self.cfg
        # backbone mode = always_partition=True (SwinBackbone.forward):
        # window/shift sizes never shrink; small maps are padded instead
        window, shift = cfg.window_size, self.shift
        b, _, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_before")(x)
        x = x.reshape(b, h, w, c)
        pad_b = (window - h % window) % window
        pad_r = (window - w % window) % window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = shifted_window_mask(hp, wp, window, shift)
        else:
            mask = None
        xw = window_partition(x, window)
        xw = SwinSelfAttention(
            dim=self.dim, num_heads=self.num_heads, window=window,
            qkv_bias=cfg.qkv_bias, name="attention_self",
        )(xw, mask)
        xw = nn.Dense(self.dim, name="attention_output_dense")(xw)
        x = window_reverse(xw.reshape(-1, window, window, c), window, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = shortcut + x.reshape(b, h * w, c)

        hmid = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_after")(x)
        hmid = nn.Dense(
            int(self.dim * cfg.mlp_ratio), name="intermediate_dense"
        )(hmid)
        hmid = pgelu(hmid)
        hmid = nn.Dense(self.dim, name="output_dense")(hmid)
        return x + hmid


class SwinPatchMerging(nn.Module):
    cfg: SwinConfig
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinBackbone(nn.Module):
    """Multi-scale feature extractor (SwinBackbone.forward semantics)."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> Tuple[jax.Array, ...]:
        """(B, H, W, 3) -> tuple of NHWC feature maps, one per out stage."""
        cfg = self.cfg
        p = cfg.patch_size
        b, h, w, _ = pixel_values.shape
        pad_b = (p - h % p) % p
        pad_r = (p - w % p) % p
        if pad_b or pad_r:
            pixel_values = jnp.pad(
                pixel_values, ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
            )
        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
            name="patch_embeddings_projection",
        )(pixel_values)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, hh * ww, cfg.embed_dim)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)

        outputs = []
        dims = cfg.stage_dims
        for i, depth in enumerate(cfg.depths):
            for j in range(depth):
                x = SwinBlock(
                    cfg=cfg, dim=dims[i], num_heads=cfg.num_heads[i],
                    shift=0 if j % 2 == 0 else cfg.window_size // 2,
                    name=f"layers_{i}_blocks_{j}",
                )(x, hh, ww)
            before_ds = x.reshape(b, hh, ww, dims[i])
            if (i + 1) in cfg.out_stages:
                normed = nn.LayerNorm(
                    epsilon=1e-5, name=f"hidden_states_norms_stage{i + 1}"
                )(before_ds.reshape(b, hh * ww, dims[i]))
                outputs.append(normed.reshape(b, hh, ww, dims[i]))
            if i < len(cfg.depths) - 1:
                x = SwinPatchMerging(
                    cfg=cfg, dim=dims[i], name=f"layers_{i}_downsample"
                )(x, hh, ww)
                hh, ww = (hh + 1) // 2, (ww + 1) // 2
        return tuple(outputs)
