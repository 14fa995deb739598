"""Depth-Anything-V2 (metric) in flax: DINOv2 ViT-L + DPT head.

Rebuild of the reference's only depth source
(third_party/Depth-Anything-V2/metric_depth/depth_anything_v2/
{dinov2.py,dpt.py,util/blocks.py}; wrapper metric_depth/depth.py:13-63):

* DINOv2 encoder: patch-14 ViT (vitl: dim 1024, 24 layers, 16 heads),
  layer-scale (init 1.0), cls token, learned pos embed with bicubic
  interpolation to the input grid; intermediate layers [4, 11, 17, 23]
  each passed through the final LayerNorm (dinov2.py:297-323).
* DPT head: per-level 1x1 projections to [256, 512, 1024, 1024],
  resize stack (4x/2x deconv, identity, stride-2 conv), 3x3 scratch
  convs to 256, RefineNet top-down fusion (two ResidualConvUnits +
  bilinear align_corners upsample + 1x1 out conv), then
  conv3x3 -> upsample x14 -> conv3x3 -> relu -> conv1x1 -> sigmoid *
  max_depth (dpt.py:38-185).

Param names mirror the torch module tree for checkpoint conversion.
All convs are NHWC (TPU-native layout); the converter transposes.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.gelu import gelu as pgelu


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    mlp_ratio: float = 4.0
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    intermediate_layers: Tuple[int, ...] = (4, 11, 17, 23)
    max_depth: float = 20.0
    native_grid: int = 37  # 518 / 14 pos-embed grid

    @staticmethod
    def vitl(max_depth: float = 20.0) -> "DepthAnythingConfig":
        return DepthAnythingConfig(max_depth=max_depth)

    @staticmethod
    def vits(max_depth: float = 20.0) -> "DepthAnythingConfig":
        return DepthAnythingConfig(
            embed_dim=384, depth=12, num_heads=6,
            out_channels=(48, 96, 192, 384),
            intermediate_layers=(2, 5, 8, 11),
            features=64, max_depth=max_depth,
        )

    def tiny(self) -> "DepthAnythingConfig":
        return DepthAnythingConfig(
            embed_dim=64, depth=4, num_heads=4,
            out_channels=(16, 24, 32, 32),
            intermediate_layers=(0, 1, 2, 3),
            features=16, max_depth=self.max_depth, native_grid=8,
        )


class DinoBlock(nn.Module):
    """Pre-norm ViT block with LayerScale (dinov2_layers/block.py)."""

    dim: int
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, _ = x.shape
        hd = self.dim // self.num_heads
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        # three matmuls instead of one packed qkv projection: identical
        # math (the torch qkv weight is split row-wise in the converter)
        # but q/k/v are written contiguous, skipping the extra HBM pass
        # XLA spends slicing a (B,S,3,H,D) pack (~19 ms / 24 layers)
        q = nn.Dense(self.dim, name="attn_q")(h).reshape(b, s, self.num_heads, hd)
        k = nn.Dense(self.dim, name="attn_k")(h).reshape(b, s, self.num_heads, hd)
        v = nn.Dense(self.dim, name="attn_v")(h).reshape(b, s, self.num_heads, hd)
        from egoscaler_tpu.ops.attention import dot_product_attention

        a = dot_product_attention(q, k, v).reshape(b, s, self.dim)
        a = nn.Dense(self.dim, name="attn_proj")(a)
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        x = x + a * ls1

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = pgelu(h)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        return x + h * ls2


class DinoV2(nn.Module):
    cfg: DepthAnythingConfig

    @nn.compact
    def __call__(self, images: jax.Array):
        """images (B, H, W, 3) normalized -> list of (patch_tokens, cls)."""
        cfg = self.cfg
        b, h, w, _ = images.shape
        ph, pw = h // cfg.patch_size, w // cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="patch_embed",
        )(images)
        x = x.reshape(b, ph * pw, cfg.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.native_grid * cfg.native_grid + 1, cfg.embed_dim),
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (cfg.native_grid, cfg.native_grid):
            grid = patch_pos.reshape(
                1, cfg.native_grid, cfg.native_grid, cfg.embed_dim
            )
            grid = jax.image.resize(
                grid, (1, ph, pw, cfg.embed_dim), method="bicubic"
            )
            patch_pos = grid.reshape(1, ph * pw, cfg.embed_dim)
        x = x + patch_pos
        cls_tok = jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)) + cls_pos
        x = jnp.concatenate([cls_tok, x], axis=1)

        outputs = []
        take = set(cfg.intermediate_layers)
        for i in range(cfg.depth):
            x = DinoBlock(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, name=f"blocks_{i}"
            )(x)
            if i in take:
                outputs.append(x)
        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        outs = []
        for o in outputs:
            o = norm(o)
            outs.append((o[:, 1:], o[:, 0]))  # (patches, cls)
        return outs, (ph, pw)


def _interp_matrix(n_in: int, n_out: int):
    """(n_out, n_in) bilinear align-corners interpolation matrix
    (2 non-zeros per row)."""
    import numpy as np

    ys = np.linspace(0.0, n_in - 1.0, n_out)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, n_in - 1)
    y1 = np.minimum(y0 + 1, n_in - 1)
    dy = (ys - y0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), y0] += 1.0 - dy
    m[np.arange(n_out), y1] += dy
    return m


def _resize_bilinear_ac(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True (torch F.interpolate) for
    NHWC tensors — jax.image.resize uses half-pixel centers, so sample
    manually.  Separable (rows then cols): 2 gathers + lerps instead of
    4 full-size gathers, halving HBM traffic on the big DPT-head
    upsamples.  In bf16 (the TPU inference path) the lerp is instead
    expressed as two constant interpolation-matrix matmuls: identical
    weights, but the MXU streams them at full HBM bandwidth where the
    row/column gathers run at the ~120 GB/s elementwise-copy rate."""
    b, h, w, c = x.shape
    oh, ow = size
    if x.dtype == jnp.bfloat16:
        my = jnp.asarray(_interp_matrix(h, oh), x.dtype)
        mx = jnp.asarray(_interp_matrix(w, ow), x.dtype)
        rows = jnp.einsum("ph,bhwc->bpwc", my, x)
        return jnp.einsum("qw,bpwc->bpqc", mx, rows)
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32).clip(0, h - 1)
    x0 = jnp.floor(xs).astype(jnp.int32).clip(0, w - 1)
    y1 = (y0 + 1).clip(0, h - 1)
    x1 = (x0 + 1).clip(0, w - 1)
    dy = (ys - y0).astype(x.dtype).reshape(1, oh, 1, 1)
    dx = (xs - x0).astype(x.dtype).reshape(1, 1, ow, 1)
    rows = x[:, y0] * (1 - dy) + x[:, y1] * dy          # (B, oh, w, C)
    return rows[:, :, x0] * (1 - dx) + rows[:, :, x1] * dx


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = _resize_bilinear_ac(x, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    cfg: DepthAnythingConfig

    @nn.compact
    def __call__(self, features, patch_hw):
        cfg = self.cfg
        ph, pw = patch_hw
        outs = []
        for i, (tokens, _cls) in enumerate(features):
            b, n, d = tokens.shape
            x = tokens.reshape(b, ph, pw, d)
            x = nn.Conv(cfg.out_channels[i], (1, 1), name=f"projects_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(
                    cfg.out_channels[0], (4, 4), strides=(4, 4),
                    padding="VALID", name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    cfg.out_channels[1], (2, 2), strides=(2, 2),
                    padding="VALID", name="resize_1",
                )(x)
            elif i == 3:
                x = nn.Conv(
                    cfg.out_channels[3], (3, 3), strides=(2, 2), padding=1,
                    name="resize_3",
                )(x)
            outs.append(x)

        l1, l2, l3, l4 = outs
        f = cfg.features
        l1 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer1_rn")(l1)
        l2 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer2_rn")(l2)
        l3 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer3_rn")(l3)
        l4 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="layer4_rn")(l4)

        p4 = FeatureFusionBlock(f, name="refinenet4")(
            l4, size=l3.shape[1:3]
        )
        p3 = FeatureFusionBlock(f, name="refinenet3")(p4, l3, size=l2.shape[1:3])
        p2 = FeatureFusionBlock(f, name="refinenet2")(p3, l2, size=l1.shape[1:3])
        p1 = FeatureFusionBlock(f, name="refinenet1")(p2, l1)

        out = nn.Conv(f // 2, (3, 3), padding=1, name="output_conv1")(p1)
        out = _resize_bilinear_ac(out, (ph * cfg.patch_size, pw * cfg.patch_size))
        out = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="output_conv2_2")(out)
        return nn.sigmoid(out)[..., 0]


class DepthAnythingV2(nn.Module):
    """images (B, H, W, 3) ImageNet-normalized -> metric depth (B, H, W)."""

    cfg: DepthAnythingConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        feats, phw = DinoV2(self.cfg, name="pretrained")(images)
        depth = DPTHead(self.cfg, name="depth_head")(feats, phw)
        return depth * self.cfg.max_depth


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def preprocess_image(
    image: jax.Array, input_size: int = 518, patch: int = 14
) -> Tuple[jax.Array, Tuple[int, int]]:
    """rgb uint8/float (H, W, 3) -> normalized (1, S, S', 3) multiple of 14.

    Reference transform (dpt.py:197-222): lower-bound keep-aspect resize
    to `input_size`, multiple-of-14, bicubic; ImageNet normalize.
    """
    h, w = image.shape[:2]
    scale = input_size / min(h, w)
    nh = int(round(h * scale / patch) * patch)
    nw = int(round(w * scale / patch) * patch)
    x = image.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (nh, nw, 3), method="bicubic")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x[None], (h, w)


def infer_depth(model, params, image: jax.Array, input_size: int = 518):
    """Full infer_image equivalent: preprocess, forward, resize back."""
    x, (h, w) = preprocess_image(image, input_size)
    depth = model.apply(params, x)
    return _resize_bilinear_ac(depth[..., None], (h, w))[0, ..., 0]
