"""Softmax splatting (forward warping) — TPU-native.

Reference: SpaTracker's inline CUDA kernels `softsplat_out`,
`softsplat_ingrad`, `softsplat_flowgrad`
(SpaTracker/models/spatracker/models/core/spatracker/softsplat.py),
which forward-warp feature maps onto triplanes with softmax-weighted
bilinear scatter and a hand-written backward.

TPU-native design: the hand-written CUDA backward exists only because
torch couldn't differentiate the scatter efficiently.  XLA's transpose
of scatter-add IS a gather, so a direct `.at[].add` formulation is both
fast on TPU (lowers to sorted segment-sum) and exactly differentiable —
including the flow gradients through the bilinear weights.  ~30 lines
replace ~500 lines of CUDA.

Modes (matching the reference API):
  "sum":     out = sum_p b_p(q) * f_p
  "avg":     out = sum / sum_p b_p(q)
  "linear":  weights w = metric (last input channel convention dropped —
             pass `metric` explicitly instead)
  "softmax": out = sum_p b_p(q) exp(z_p) f_p / sum_p b_p(q) exp(z_p)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softsplat(
    features: jax.Array,     # (B, C, H, W)
    flow: jax.Array,         # (B, 2, H, W)  (u, v) target offsets
    metric: Optional[jax.Array] = None,  # (B, 1, H, W) softmax logits
    mode: str = "softmax",
    out_hw: Optional[tuple] = None,
) -> jax.Array:
    """Forward-warp `features` along `flow` with softmax weighting."""
    b, c, h, w = features.shape
    oh, ow = out_hw or (h, w)

    if mode == "softmax":
        assert metric is not None
        # subtract per-image max for stability (exp never overflows)
        z = metric - jnp.max(metric, axis=(2, 3), keepdims=True)
        weight = jnp.exp(z)
        feats = jnp.concatenate([features * weight, weight], axis=1)
    elif mode == "linear":
        assert metric is not None
        feats = jnp.concatenate([features * metric, metric], axis=1)
    elif mode == "avg":
        feats = jnp.concatenate(
            [features, jnp.ones((b, 1, h, w), features.dtype)], axis=1
        )
    elif mode == "sum":
        feats = features
    else:
        raise ValueError(mode)

    cc = feats.shape[1]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + flow[:, 0]
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + flow[:, 1]

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    dx = gx - x0
    dy = gy - y0

    out = jnp.zeros((b, cc, oh * ow), feats.dtype)
    flat = feats.reshape(b, cc, h * w)

    for ox, oy, wgt in (
        (0, 0, (1 - dx) * (1 - dy)),
        (1, 0, dx * (1 - dy)),
        (0, 1, (1 - dx) * dy),
        (1, 1, dx * dy),
    ):
        tx = x0 + ox
        ty = y0 + oy
        inside = (tx >= 0) & (tx < ow) & (ty >= 0) & (ty < oh)
        idx = (ty.astype(jnp.int32) * ow + tx.astype(jnp.int32)).clip(0, oh * ow - 1)
        wgt = jnp.where(inside, wgt, 0.0).reshape(b, 1, h * w)
        idx = idx.reshape(b, h * w)
        contrib = flat * wgt
        out = jax.vmap(
            lambda o, i, cvals: o.at[:, i].add(cvals)
        )(out, idx, contrib)

    out = out.reshape(b, cc, oh, ow)
    if mode in ("softmax", "linear", "avg"):
        norm = out[:, -1:, :, :]
        out = out[:, :-1] / jnp.maximum(norm, 1e-7)
    return out
