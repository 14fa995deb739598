"""PointBERT (PointTransformer) encoder in flax.

TPU-native rebuild of the reference encoder
(models/pointllm/pointllm/model/pointbert/{dvae.py,point_encoder.py}):

* Group: FPS centers + kNN neighborhoods, center-relative xyz, rgb
  passthrough (dvae.py:143-187) — built from ops/fps.py + ops/knn.py so
  the whole grouping stage is two MXU matmuls + gathers.
* Encoder: per-group PointNet (1x1 convs == dense over channels) with
  max-pool + global-feature concat (dvae.py:189-221).
* PointTransformer: 12-layer ViT (dim 384, 6 heads) over 512 group
  tokens + cls token, positional MLP on group centers re-added at every
  block (point_encoder.py:79-189).

Parameter names deliberately mirror the torch module tree
(first_conv/second_conv/reduce_dim/cls_token/cls_pos/pos_embed/blocks/
norm) so the torch->jax checkpoint converter is a name map, not a
surgery (SURVEY.md §5.4).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.gelu import gelu as pgelu

from egoscaler_tpu.configs import PointBertConfig
from egoscaler_tpu.ops.fps import farthest_point_sampling, gather_points
from egoscaler_tpu.ops.knn import gather_groups, knn_indices


class Group(nn.Module):
    """FPS + kNN grouping (dvae.py:143-187).  Pure function of points."""

    num_group: int
    group_size: int

    @nn.compact
    def __call__(self, pts: jax.Array, fps_key: Optional[jax.Array] = None):
        xyz = pts[..., :3]
        center_idx = farthest_point_sampling(xyz, self.num_group, fps_key)
        center = gather_points(xyz, center_idx)  # (B, G, 3)
        idx = knn_indices(xyz, center, self.group_size)  # (B, G, K)
        neighborhood = gather_groups(pts, idx)  # (B, G, K, C)
        rel_xyz = neighborhood[..., :3] - center[:, :, None, :]
        neighborhood = jnp.concatenate(
            [rel_xyz, neighborhood[..., 3:]], axis=-1
        )
        return neighborhood, center


class GroupEncoder(nn.Module):
    """Per-group PointNet encoder (dvae.py:189-221).

    torch Conv1d(k=1) -> Dense; BatchNorm1d -> BatchNorm over the flat
    (B*G*K) token axis.  The backbone is frozen during trajectory training
    (model_arch.py:37-39), so batch stats run in inference mode by default.
    """

    encoder_channel: int
    point_input_dims: int = 6

    @nn.compact
    def __call__(self, point_groups: jax.Array, train: bool = False):
        b, g, k, c = point_groups.shape
        x = point_groups.reshape(b * g, k, c)
        # first_conv: C -> 128 -> BN -> ReLU -> 256
        x = nn.Dense(128, name="first_conv_0")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="first_conv_1", axis_name=None,
        )(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="first_conv_3")(x)
        # concat global max-pooled feature
        xg = jnp.max(x, axis=1, keepdims=True)  # (BG, 1, 256)
        x = jnp.concatenate([jnp.broadcast_to(xg, x.shape), x], axis=-1)
        # second_conv: 512 -> 512 -> BN -> ReLU -> encoder_channel
        x = nn.Dense(512, name="second_conv_0")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="second_conv_1", axis_name=None,
        )(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, name="second_conv_3")(x)
        x = jnp.max(x, axis=1)  # (BG, C_enc)
        return x.reshape(b, g, self.encoder_channel)


class ViTBlock(nn.Module):
    """Pre-norm transformer block (point_encoder.py:58-76)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        b, s, _ = h.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="attn_qkv")(h)
        qkv = qkv.reshape(b, s, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        from egoscaler_tpu.ops.attention import dot_product_attention

        attn = dot_product_attention(q, k, v)
        attn = attn.reshape(b, s, self.dim)
        attn = nn.Dense(self.dim, name="attn_proj")(attn)
        x = x + self._drop_path(attn, deterministic)

        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = pgelu(h)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + self._drop_path(h, deterministic)

    def _drop_path(self, x, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
        return jnp.where(mask, x / keep, 0.0)


class PointTransformer(nn.Module):
    """Full PointBERT encoder (point_encoder.py:101-189).

    Input: (B, N, point_dims) normalized colored point cloud.
    Output: (B, num_group + 1, trans_dim) token features (cls first).
    """

    cfg: PointBertConfig

    @nn.compact
    def __call__(
        self,
        pts: jax.Array,
        train: bool = False,
        fps_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        neighborhood, center = Group(
            num_group=cfg.num_group, group_size=cfg.group_size, name="group_divider"
        )(pts, fps_key)
        tokens = GroupEncoder(
            encoder_channel=cfg.encoder_dims,
            point_input_dims=cfg.point_dims,
            name="encoder",
        )(neighborhood, train=train)
        tokens = nn.Dense(cfg.trans_dim, name="reduce_dim")(tokens)

        b = tokens.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.trans_dim)
        )
        cls_pos = self.param(
            "cls_pos", nn.initializers.normal(1.0), (1, 1, cfg.trans_dim)
        )
        pos = nn.Dense(128, name="pos_embed_0")(center)
        pos = pgelu(pos)
        pos = nn.Dense(cfg.trans_dim, name="pos_embed_2")(pos)

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, cfg.trans_dim)), tokens], axis=1
        )
        pos = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (b, 1, cfg.trans_dim)), pos], axis=1
        )

        import numpy as np

        dpr = [float(r) for r in np.linspace(0.0, cfg.drop_path_rate, cfg.depth)]
        for i in range(cfg.depth):
            # pos re-added at EVERY block (point_encoder.py:95-98)
            x = ViTBlock(
                dim=cfg.trans_dim,
                num_heads=cfg.num_heads,
                drop_path=dpr[i],
                name=f"blocks_{i}",
            )(x + pos, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x


def pc_norm(pc: jax.Array) -> jax.Array:
    """Center + unit-sphere normalize xyz, preserving extra channels
    (pointllm/data/utils.py:146-157)."""
    xyz = pc[..., :3]
    centroid = jnp.mean(xyz, axis=-2, keepdims=True)
    xyz = xyz - centroid
    m = jnp.max(jnp.linalg.norm(xyz, axis=-1, keepdims=True), axis=-2, keepdims=True)
    xyz = xyz / jnp.maximum(m, 1e-12)
    return jnp.concatenate([xyz, pc[..., 3:]], axis=-1)
