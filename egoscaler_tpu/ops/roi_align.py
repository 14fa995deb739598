"""ROI Align / ROI Pool as vectorized gathers.

Reference: hand_object_detector's CUDA ROI kernels
(lib/model/roi_align/src/roi_align_kernel.cu, roi_pooling, roi_crop —
SURVEY.md §2.3).  On TPU these are plain bilinear gathers vmapped over
rois — XLA fuses them; no custom kernel needed at Faster-RCNN sizes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear(fm: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Sample (C, H, W) feature map at float coords y, x (broadcasted)."""
    c, h, w = fm.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    dy = y - y0
    dx = x - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def at(yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        return fm[:, yy, xx]

    v = (
        at(y0, x0) * ((1 - dy) * (1 - dx))
        + at(y0, x0 + 1) * ((1 - dy) * dx)
        + at(y0 + 1, x0) * (dy * (1 - dx))
        + at(y0 + 1, x0 + 1) * (dy * dx)
    )
    # zero outside the feature map (torchvision aligned behavior clips;
    # fully-outside samples contribute border values — match torchvision)
    return v


def roi_align(
    features: jax.Array,   # (C, H, W)
    rois: jax.Array,       # (R, 4) [x1, y1, x2, y2] in feature coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """torchvision-compatible ROI Align -> (R, C, output_size, output_size)."""
    offset = 0.5 if aligned else 0.0

    def one_roi(roi):
        x1, y1, x2, y2 = roi - jnp.asarray([offset, offset, offset, offset])
        rw = jnp.maximum(x2 - x1, 1e-6)
        rh = jnp.maximum(y2 - y1, 1e-6)
        bin_w = rw / output_size
        bin_h = rh / output_size
        s = sampling_ratio
        # sample grid: output_size*s points per axis, bin-centered
        ys = y1 + (jnp.arange(output_size * s, dtype=jnp.float32) + 0.5) * bin_h / s
        xs = x1 + (jnp.arange(output_size * s, dtype=jnp.float32) + 0.5) * bin_w / s
        grid_y = jnp.repeat(ys[:, None], output_size * s, axis=1)
        grid_x = jnp.repeat(xs[None, :], output_size * s, axis=0)
        vals = _bilinear(features, grid_y, grid_x)  # (C, os*s, os*s)
        c = vals.shape[0]
        vals = vals.reshape(c, output_size, s, output_size, s)
        return jnp.mean(vals, axis=(2, 4))

    return jax.vmap(one_roi)(rois.astype(jnp.float32))


def roi_pool(
    features: jax.Array, rois: jax.Array, output_size: int = 7,
    sampling_ratio: int = 4,
) -> jax.Array:
    """Max-pool ROI variant (roi_pooling_kernel.cu): max over samples."""
    def one_roi(roi):
        x1, y1, x2, y2 = roi
        rw = jnp.maximum(x2 - x1, 1e-6)
        rh = jnp.maximum(y2 - y1, 1e-6)
        s = sampling_ratio
        ys = y1 + (jnp.arange(output_size * s, dtype=jnp.float32) + 0.5) * rh / (
            output_size * s
        )
        xs = x1 + (jnp.arange(output_size * s, dtype=jnp.float32) + 0.5) * rw / (
            output_size * s
        )
        grid_y = jnp.repeat(ys[:, None], output_size * s, axis=1)
        grid_x = jnp.repeat(xs[None, :], output_size * s, axis=0)
        vals = _bilinear(features, grid_y, grid_x)
        c = vals.shape[0]
        vals = vals.reshape(c, output_size, s, output_size, s)
        return jnp.max(vals, axis=(2, 4))

    return jax.vmap(one_roi)(rois.astype(jnp.float32))
