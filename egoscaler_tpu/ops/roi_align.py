"""ROI Align / ROI Pool as vectorized gathers.

Reference: hand_object_detector's CUDA ROI kernels
(lib/model/roi_align/src/roi_align_kernel.cu, roi_pooling, roi_crop —
SURVEY.md §2.3).  On TPU these are plain bilinear gathers vmapped over
rois — XLA fuses them; no custom kernel needed at Faster-RCNN sizes.
"""
from __future__ import annotations

import math

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


def roi_pool_quantized(
    features: jax.Array,   # (C, H, W)
    rois: jax.Array,       # (R, 4) [x1, y1, x2, y2] in IMAGE coords
    output_size: int = 7,
    spatial_scale: float = 1.0,
) -> jax.Array:
    """Exact quantized ROI max-pool (POOLING_MODE == 'pool').

    Matches the reference CUDA kernel semantics
    (hand_object_detector/lib/model/roi_pooling/src/roi_pooling_kernel.cu
    :45-79): roi corners rounded to integers after spatial_scale, bins
    `[floor(p*bs), ceil((p+1)*bs))`, max over integer cells, empty bins
    produce 0.  Fixed shapes for jit: each bin gathers a static
    `ceil(dim/output_size)+2` window (the largest any bin can be) and
    masks cells past the bin end.
    """
    c, h, w = features.shape
    kh = math.ceil(h / output_size) + 2
    kw = math.ceil(w / output_size) + 2
    p = jnp.arange(output_size, dtype=jnp.float32)

    def one_roi(roi):
        r = jnp.round(roi.astype(jnp.float32) * spatial_scale).astype(jnp.int32)
        x1, y1, x2, y2 = r[0], r[1], r[2], r[3]
        rw = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
        rh = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
        bsh = rh / output_size
        bsw = rw / output_size
        hstart = jnp.clip(jnp.floor(p * bsh).astype(jnp.int32) + y1, 0, h)
        hend = jnp.clip(jnp.ceil((p + 1) * bsh).astype(jnp.int32) + y1, 0, h)
        wstart = jnp.clip(jnp.floor(p * bsw).astype(jnp.int32) + x1, 0, w)
        wend = jnp.clip(jnp.ceil((p + 1) * bsw).astype(jnp.int32) + x1, 0, w)

        rows = hstart[:, None] + jnp.arange(kh)[None, :]          # (P, kh)
        cols = wstart[:, None] + jnp.arange(kw)[None, :]          # (P, kw)
        rmask = rows < hend[:, None]
        cmask = cols < wend[:, None]
        rows_c = jnp.clip(rows, 0, h - 1)
        cols_c = jnp.clip(cols, 0, w - 1)
        # (C, P, kh, P, kw) window gather
        vals = features[:, rows_c[:, :, None, None], cols_c[None, None, :, :]]
        mask = rmask[:, :, None, None] & cmask[None, None, :, :]
        vals = jnp.where(mask[None], vals, -jnp.inf)
        out = jnp.max(vals, axis=(2, 4))                          # (C, P, P)
        empty = ~jnp.any(mask, axis=(1, 3))                       # (P, P)
        return jnp.where(empty[None], 0.0, out)

    return jax.vmap(one_roi)(rois)


def _bilinear_zero(fm: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """(C, H, W) bilinear sample with zero padding outside (grid_sample
    padding_mode='zeros')."""
    c, h, w = fm.shape
    y0f = jnp.floor(y)
    x0f = jnp.floor(x)
    dy = y - y0f
    dx = x - x0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    def at(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = fm[:, jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inb[None], v, 0.0)

    return (
        at(y0, x0) * ((1 - dy) * (1 - dx))
        + at(y0, x0 + 1) * ((1 - dy) * dx)
        + at(y0 + 1, x0) * (dy * (1 - dx))
        + at(y0 + 1, x0 + 1) * (dy * dx)
    )


def roi_crop(
    features: jax.Array,   # (C, H, W)
    rois: jax.Array,       # (R, 4) [x1, y1, x2, y2] in feature coords
    grid_size: int = 7,
) -> jax.Array:
    """Spatial-transformer ROI crop (POOLING_MODE == 'crop').

    Matches `_affine_grid_gen` + `F.grid_sample`
    (hand_object_detector/lib/model/utils/net_utils.py:264-286,
    roi_crop/functions/crop_resize.py): the affine theta maps the roi
    box onto an align-corners [-1,1]^2 grid, so sample points run
    uniformly from (x1, y1) to (x2, y2) inclusive; samples outside the
    map are zero-padded.  Differentiable in both features and rois (the
    reference's BilinearSampler backward gives grads to the grid; here
    autodiff provides both for free).
    """
    t = jnp.linspace(-1.0, 1.0, grid_size)

    def one_roi(roi):
        x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
        # theta (net_utils.py:276-284) composed with align-corners
        # denormalization collapses to a straight lerp corner-to-corner
        xs = x1 + (x2 - x1) * (t + 1.0) / 2.0
        ys = y1 + (y2 - y1) * (t + 1.0) / 2.0
        grid_y = jnp.repeat(ys[:, None], grid_size, axis=1)
        grid_x = jnp.repeat(xs[None, :], grid_size, axis=0)
        return _bilinear_zero(features, grid_y, grid_x)

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
