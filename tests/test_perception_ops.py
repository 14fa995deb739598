"""Perception ops vs torch/torchvision oracles (CPU torch available)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egoscaler_tpu.ops.nms import box_iou, nms
from egoscaler_tpu.ops.roi_align import roi_align
from egoscaler_tpu.ops.softsplat import softsplat


def test_softsplat_identity_flow(rng):
    """Zero flow: softmax splatting returns the input features."""
    f = rng.normal(size=(2, 4, 8, 10)).astype(np.float32)
    flow = np.zeros((2, 2, 8, 10), np.float32)
    metric = rng.normal(size=(2, 1, 8, 10)).astype(np.float32)
    out = np.asarray(softsplat(jnp.asarray(f), jnp.asarray(flow),
                               jnp.asarray(metric), mode="softmax"))
    np.testing.assert_allclose(out, f, atol=1e-5)


def test_softsplat_integer_shift(rng):
    f = rng.normal(size=(1, 3, 6, 6)).astype(np.float32)
    flow = np.zeros((1, 2, 6, 6), np.float32)
    flow[:, 0] = 2.0  # shift right by 2
    out = np.asarray(softsplat(jnp.asarray(f), jnp.asarray(flow),
                               jnp.asarray(np.zeros((1, 1, 6, 6), np.float32)),
                               mode="softmax"))
    np.testing.assert_allclose(out[:, :, :, 2:], f[:, :, :, :-2], atol=1e-5)
    np.testing.assert_allclose(out[:, :, :, :2], 0.0, atol=1e-6)


def test_softsplat_softmax_weighting(rng):
    """Two sources landing on one target: higher metric wins."""
    f = np.zeros((1, 1, 1, 4), np.float32)
    f[0, 0, 0] = [1.0, 3.0, 0.0, 0.0]
    flow = np.zeros((1, 2, 1, 4), np.float32)
    flow[0, 0, 0, 0] = 2.0  # pixel 0 -> 2
    flow[0, 0, 0, 1] = 1.0  # pixel 1 -> 2
    metric = np.zeros((1, 1, 1, 4), np.float32)
    metric[0, 0, 0, 1] = 10.0  # pixel 1 dominates
    out = np.asarray(softsplat(jnp.asarray(f), jnp.asarray(flow),
                               jnp.asarray(metric), mode="softmax"))
    assert abs(out[0, 0, 0, 2] - 3.0) < 1e-3


def test_softsplat_gradients_flow(rng):
    """Flow gradients exist and are finite (replaces softsplat_flowgrad)."""
    f = jnp.asarray(rng.normal(size=(1, 2, 5, 5)).astype(np.float32))
    metric = jnp.asarray(rng.normal(size=(1, 1, 5, 5)).astype(np.float32))

    def loss(flow):
        return jnp.sum(softsplat(f, flow, metric, mode="softmax") ** 2)

    flow = jnp.asarray(rng.normal(size=(1, 2, 5, 5)).astype(np.float32)) * 0.5
    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def reference_nms(boxes, scores, thresh):
    """Greedy NMS, the torchvision/CUDA algorithm in plain numpy."""
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clip(0) * (boxes[:, 3] - boxes[:, 1]).clip(0)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = (rb - lt).clip(0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        alive &= iou <= thresh
    return np.array(keep)


def reference_roi_align(fm, rois, out_size, ratio):
    """torchvision aligned=True roi_align in plain numpy."""
    c, h, w = fm.shape

    def bilin(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        dy, dx = y - y0, x - x0

        def at(yy, xx):
            return fm[:, np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]

        return (
            at(y0, x0) * (1 - dy) * (1 - dx)
            + at(y0, x0 + 1) * (1 - dy) * dx
            + at(y0 + 1, x0) * dy * (1 - dx)
            + at(y0 + 1, x0 + 1) * dy * dx
        )

    out = np.zeros((len(rois), c, out_size, out_size), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi - 0.5
        bw = max(x2 - x1, 1e-6) / out_size
        bh = max(y2 - y1, 1e-6) / out_size
        for oy in range(out_size):
            for ox in range(out_size):
                acc = 0.0
                for sy in range(ratio):
                    for sx in range(ratio):
                        y = y1 + oy * bh + (sy + 0.5) * bh / ratio
                        x = x1 + ox * bw + (sx + 0.5) * bw / ratio
                        acc = acc + bilin(y, x)
                out[r, :, oy, ox] = acc / (ratio * ratio)
    return out


def test_nms_matches_reference(rng):
    boxes = rng.uniform(0, 100, size=(50, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(50, 2))
    scores = rng.uniform(0, 1, size=50).astype(np.float32)
    ref = reference_nms(boxes, scores, 0.5)
    keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=50)
    ours = np.asarray(keep)[np.asarray(valid)]
    np.testing.assert_array_equal(ours, ref)


def test_roi_align_matches_reference(rng):
    fm = rng.normal(size=(3, 16, 16)).astype(np.float32)
    rois = np.array(
        [[2.0, 3.0, 10.0, 12.0], [0.0, 0.0, 15.0, 15.0], [5.5, 5.5, 9.5, 8.5]],
        np.float32,
    )
    ref = reference_roi_align(fm, rois, 7, 2)
    ours = np.asarray(
        roi_align(jnp.asarray(fm), jnp.asarray(rois), 7, 2, aligned=True)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def reference_roi_pool(fm, rois, out_size, spatial_scale):
    """roi_pooling_kernel.cu:45-79 semantics in plain numpy."""
    c, h, w = fm.shape
    out = np.zeros((len(rois), c, out_size, out_size), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = [int(round(float(v) * spatial_scale)) for v in roi]
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        bsh = rh / out_size
        bsw = rw / out_size
        for ph in range(out_size):
            for pw in range(out_size):
                hs = min(max(int(np.floor(ph * bsh)) + y1, 0), h)
                he = min(max(int(np.ceil((ph + 1) * bsh)) + y1, 0), h)
                ws = min(max(int(np.floor(pw * bsw)) + x1, 0), w)
                we = min(max(int(np.ceil((pw + 1) * bsw)) + x1, 0), w)
                if he <= hs or we <= ws:
                    out[r, :, ph, pw] = 0.0
                else:
                    out[r, :, ph, pw] = fm[:, hs:he, ws:we].max(axis=(1, 2))
    return out


def reference_roi_crop(fm, rois, grid_size):
    """net_utils.py:264-286 affine crop (zero-padded bilinear) in numpy."""
    c, h, w = fm.shape

    def bilin(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        dy, dx = y - y0, x - x0

        def at(yy, xx):
            if yy < 0 or yy >= h or xx < 0 or xx >= w:
                return np.zeros(c, np.float32)
            return fm[:, yy, xx]

        return (
            at(y0, x0) * (1 - dy) * (1 - dx)
            + at(y0, x0 + 1) * (1 - dy) * dx
            + at(y0 + 1, x0) * dy * (1 - dx)
            + at(y0 + 1, x0 + 1) * dy * dx
        )

    t = np.linspace(-1.0, 1.0, grid_size)
    out = np.zeros((len(rois), c, grid_size, grid_size), np.float32)
    for r, (x1, y1, x2, y2) in enumerate(rois):
        for oy in range(grid_size):
            for ox in range(grid_size):
                x = x1 + (x2 - x1) * (t[ox] + 1) / 2
                y = y1 + (y2 - y1) * (t[oy] + 1) / 2
                out[r, :, oy, ox] = bilin(y, x)
    return out


def test_roi_pool_quantized_matches_reference(rng):
    from egoscaler_tpu.ops.roi_align import roi_pool_quantized

    fm = rng.normal(size=(3, 16, 16)).astype(np.float32)
    rois = np.array(
        [
            [2.0, 3.0, 10.0, 12.0],
            [0.0, 0.0, 15.0, 15.0],
            [5.5, 5.5, 9.5, 8.5],
            [14.0, 14.0, 14.0, 14.0],   # 1x1 roi -> mostly empty bins
            [32.0, 48.0, 160.0, 192.0],  # image coords, scale 1/16
        ],
        np.float32,
    )
    for scale in (1.0, 1.0 / 16.0):
        ref = reference_roi_pool(fm, rois, 7, scale)
        ours = np.asarray(
            roi_pool_quantized(jnp.asarray(fm), jnp.asarray(rois), 7, scale)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_roi_crop_matches_reference_and_is_differentiable(rng):
    import jax

    from egoscaler_tpu.ops.roi_align import roi_crop

    fm = rng.normal(size=(2, 16, 16)).astype(np.float32)
    rois = np.array(
        [[2.0, 3.0, 10.0, 12.0], [-3.0, -3.0, 18.0, 18.0], [5.5, 5.5, 9.5, 8.5]],
        np.float32,
    )
    ref = reference_roi_crop(fm, rois, 7)
    ours = np.asarray(roi_crop(jnp.asarray(fm), jnp.asarray(rois), 7))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # spatial-transformer property: grads flow to the roi coords too
    g = jax.grad(
        lambda r: roi_crop(jnp.asarray(fm), r, 7).sum()
    )(jnp.asarray(rois))
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).sum()) > 0.0


def test_box_iou(rng):
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], atol=1e-6)
