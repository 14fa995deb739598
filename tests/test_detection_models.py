"""GroundedSAM wrapper + hand-object detector tests (tiny configs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egoscaler_tpu.models.grounded_sam import (
    GrabCutSegmenter,
    GroundedSAM,
    mask_to_polygon,
    polygon_to_mask,
    refine_masks,
)
from egoscaler_tpu.models.hand_object import (
    HOD,
    HODConfig,
    HeuristicHOD,
    decode_boxes,
    make_anchors,
)


def test_polygon_roundtrip():
    mask = np.zeros((32, 32), np.uint8)
    mask[8:20, 10:25] = 1
    poly = mask_to_polygon(mask)
    back = polygon_to_mask(poly, mask.shape) > 0
    inter = (back & (mask > 0)).sum()
    union = (back | (mask > 0)).sum()
    assert inter / union > 0.9


def test_refine_masks_fills_holes():
    mask = np.zeros((32, 32), np.uint8)
    mask[5:25, 5:25] = 1
    mask[12:15, 12:15] = 0  # hole
    out = refine_masks(np.stack([mask]), polygon_refinement=True)[0]
    assert out[13, 13] > 0  # polygon fill closes the hole


def test_grabcut_segmenter_box_fallback(rng):
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    seg = GrabCutSegmenter(iters=1)
    masks = seg.segment(img, [[10, 10, 30, 30]])
    assert masks.shape == (1, 48, 48)
    # mask is inside (or equal to) the box region mostly
    ys, xs = np.nonzero(masks[0])
    if len(xs):
        assert xs.min() >= 5 and xs.max() <= 35


def test_grounded_sam_predict(rng):
    """Motion detector + grabcut: moving bright square -> mask."""
    img0 = np.full((64, 64, 3), 30, np.uint8)
    img1 = img0.copy()
    img1[20:36, 24:40] = 220
    gsam = GroundedSAM()
    # MotionDetector diff path uses [prev, cur]
    masks, boxes, scores = gsam.predict(img1, ["cup"], threshold=0.3)
    # detector compares img1 to itself (static) -> may return None; use
    # the detector interface directly with two frames instead
    from egoscaler_tpu.pipelines.stages.stage6_boxes import MotionDetector

    dets = MotionDetector().detect([img0, img1], ["cup"], 0.3)[1]
    assert dets, "motion detector missed the moving square"
    b = dets[0]["box"]
    assert 20 <= b["xmin"] <= 28 and 32 <= b["xmax"] <= 44


def test_anchors_and_decode():
    anchors = make_anchors(4, 4, stride=16)
    assert anchors.shape == (4 * 4 * 12, 4)
    deltas = jnp.zeros_like(anchors)
    out = decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchors), atol=1e-3)


def test_hod_detect_shapes(rng):
    hod = HOD(HODConfig().tiny(), input_size=128)
    img = rng.integers(0, 255, (96, 120, 3)).astype(np.uint8)
    res = hod.detect(img, thresh=0.0)
    assert set(res) == {"hand-bbox", "obj-bbox", "state", "side"}
    for box in res["hand-bbox"]:
        assert len(box) == 5
    for box in res["obj-bbox"]:
        assert len(box) == 4


def test_heuristic_hod(rng):
    frames = np.full((2, 64, 64, 3), 40, np.uint8)
    # skin-colored blob
    frames[:, 40:55, 10:25] = [180, 120, 90]
    # moving object
    frames[1, 10:20, 30:45] = 250
    res = HeuristicHOD().detect_clip(frames)
    assert len(res["hand-bbox"]) == 1
    assert len(res["obj-bbox"]) == 1
    hb = res["hand-bbox"][0]
    assert 8 <= hb[0] <= 12 and 38 <= hb[1] <= 42
