"""COCO-compatible run-length mask codec (maskApi rewrite, host-side).

The reference vendors pycocotools' C `maskApi.c` inside
hand_object_detector (SURVEY §2.3: RLE mask encode/decode backing COCO
annotations).  Masks here are tiny host-side metadata — the TPU path
consumes dense masks — so the rebuild is pure numpy implementing the
same wire format:

* runs scan the mask in **column-major** (Fortran) order and alternate
  0-run / 1-run starting with zeros (maskApi.c `rleEncode`);
* the compressed `counts` string stores each count in 5-bit chunks,
  chars offset by 48, continuation flag 0x20, with counts at index
  >= 2 delta-encoded against counts[i-2] and negative deltas
  sign-extended via the 0x10 bit of the final chunk (`rleToString` /
  `rleFrString`).

Round-trips are bit-exact with pycocotools (parity test gated on its
availability).
"""
from __future__ import annotations

from typing import Dict, List, Union

import numpy as np

RLE = Dict[str, object]  # {"size": [h, w], "counts": bytes | list[int]}


def _mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Column-major alternating run lengths, first run counts zeros."""
    flat = np.asarray(mask, dtype=bool).flatten(order="F")
    n = flat.size
    if n == 0:
        return np.zeros((0,), np.int64)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    bounds = np.concatenate([[0], change, [n]])
    runs = np.diff(bounds)
    if flat[0]:  # counts must start with a (possibly empty) zero-run
        runs = np.concatenate([[0], runs])
    return runs.astype(np.int64)


def _counts_to_mask(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    if total != h * w:
        raise ValueError(f"run lengths sum to {total}, expected {h * w}")
    vals = np.zeros(len(counts), bool)
    vals[1::2] = True
    flat = np.repeat(vals, counts)
    return flat.reshape((h, w), order="F")


def _counts_to_string(counts: np.ndarray) -> bytes:
    """maskApi.c rleToString: 5-bit LEB chunks, delta from counts[i-2]."""
    out = bytearray()
    counts = [int(c) for c in counts]
    for i, c in enumerate(counts):
        x = c - counts[i - 2] if i > 2 else c
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            more = (x != -1) if (chunk & 0x10) else (x != 0)
            if more:
                chunk |= 0x20
            out.append(chunk + 48)
    return bytes(out)


def _string_to_counts(s: Union[bytes, str]) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: List[int] = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode_rle(mask: np.ndarray, compress: bool = True) -> RLE:
    """(H, W) bool/0-1 mask -> COCO RLE dict (compressed by default)."""
    mask = np.asarray(mask)
    h, w = mask.shape
    counts = _mask_to_counts(mask)
    return {
        "size": [int(h), int(w)],
        "counts": _counts_to_string(counts) if compress else counts.tolist(),
    }


def decode_rle(rle: RLE) -> np.ndarray:
    """COCO RLE dict (compressed or raw counts) -> (H, W) bool mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _string_to_counts(counts)
    return _counts_to_mask(np.asarray(counts, np.int64), int(h), int(w))


def rle_area(rle: RLE) -> int:
    """Foreground pixel count (maskApi rleArea)."""
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _string_to_counts(counts)
    return int(np.asarray(counts, np.int64)[1::2].sum())


def rle_to_bbox(rle: RLE) -> np.ndarray:
    """[x, y, w, h] tight bbox of the foreground (maskApi rleToBbox)."""
    m = decode_rle(rle)
    ys, xs = np.nonzero(m)
    if ys.size == 0:
        return np.zeros(4, np.float64)
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return np.array([x0, y0, x1 - x0 + 1, y1 - y0 + 1], np.float64)
