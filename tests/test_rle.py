"""COCO RLE codec: round-trips, wire-format details, pycocotools parity.

Reference: hand_object_detector/lib/pycocotools/maskApi.c (rleEncode
:29-39, rleToString :114-127, rleFrString :129-145) — SURVEY §2.3.
"""
import numpy as np
import pytest

from egoscaler_tpu.data.tools.rle import (
    decode_rle,
    encode_rle,
    rle_area,
    rle_to_bbox,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_roundtrip_random(rng):
    for _ in range(5):
        m = rng.random((37, 23)) < 0.4
        for compress in (True, False):
            rle = encode_rle(m, compress=compress)
            assert np.array_equal(decode_rle(rle), m)


def test_roundtrip_blocky(rng):
    """Long runs exercise multi-chunk LEB encoding and the delta path."""
    m = np.zeros((200, 300), bool)
    m[20:180, 40:260] = True
    m[50:60, :] = False
    rle = encode_rle(m)
    assert np.array_equal(decode_rle(rle), m)
    assert rle_area(rle) == int(m.sum())
    x, y, w, h = rle_to_bbox(rle)
    ys, xs = np.nonzero(m)
    assert (x, y) == (xs.min(), ys.min())
    assert (w, h) == (xs.max() - xs.min() + 1, ys.max() - ys.min() + 1)


def test_edge_masks():
    all_on = np.ones((5, 4), bool)
    all_off = np.zeros((5, 4), bool)
    single = np.zeros((1, 1), bool)
    for m in (all_on, all_off, single):
        assert np.array_equal(decode_rle(encode_rle(m)), m)
    assert rle_area(encode_rle(all_off)) == 0
    assert np.array_equal(rle_to_bbox(encode_rle(all_off)), np.zeros(4))


def test_column_major_order():
    """counts must scan columns first (COCO convention): a single set
    pixel at (row 1, col 0) of a 3x2 mask gives a leading zero-run of 1,
    not of 2 (row-major would)."""
    m = np.zeros((3, 2), bool)
    m[1, 0] = True
    rle = encode_rle(m, compress=False)
    assert rle["counts"] == [1, 1, 4]


def test_counts_must_cover_grid():
    with pytest.raises(ValueError):
        decode_rle({"size": [4, 4], "counts": [3, 2]})


def test_pycocotools_parity(rng):
    cocomask = pytest.importorskip("pycocotools.mask")
    for _ in range(5):
        m = (rng.random((64, 48)) < 0.3).astype(np.uint8)
        theirs = cocomask.encode(np.asfortranarray(m))
        ours = encode_rle(m.astype(bool))
        assert ours["counts"] == theirs["counts"]
        assert np.array_equal(
            decode_rle(theirs), cocomask.decode(theirs).astype(bool)
        )
