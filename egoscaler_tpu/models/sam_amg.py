"""SAM automatic mask generation (AMG), TPU-native.

Rebuild of segment_anything's SamAutomaticMaskGenerator (the SAM-repo
capability the GroundedSAM wrapper sits on; reference vendors it via
grounded_sam.py).  The torch original loops over point batches and does
host-side filtering; here the WHOLE grid runs as one batched prompt
tensor through one jitted program — grid -> (P, 3) masks + IoU ->
pred-IoU filter -> stability-score filter -> mask->box -> NMS dedup —
all fixed-shape; the host sees only the final (K, h, w) stack.

Filter semantics match the original: `pred_iou_thresh` on the model's
IoU head, `stability_score_thresh` on the +-offset threshold IoU
(amg.py calculate_stability_score), box NMS at `box_nms_thresh`.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from egoscaler_tpu.models.sam import SamConfig, SamModel
from egoscaler_tpu.ops.nms import nms


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) evenly spaced points in [0,1]^2 (amg.py build_point_grid:
    offset 1/(2n), row-major)."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1.0 - offset, n_per_side, dtype=np.float32)
    x, y = np.meshgrid(coords, coords)
    return np.stack([x.reshape(-1), y.reshape(-1)], axis=1)


def stability_score(
    logits: jax.Array, mask_threshold: float = 0.0, offset: float = 1.0
) -> jax.Array:
    """IoU between the mask thresholded at +-offset around the cutoff
    (amg.py calculate_stability_score)."""
    hi = (logits > mask_threshold + offset).sum(axis=(-1, -2))
    lo = (logits > mask_threshold - offset).sum(axis=(-1, -2))
    return hi.astype(jnp.float32) / jnp.maximum(lo, 1).astype(jnp.float32)


def _mask_boxes(masks: jax.Array) -> jax.Array:
    """(K, h, w) bool -> (K, 4) xyxy boxes (0-size when empty)."""
    k, h, w = masks.shape
    any_row = masks.any(axis=2)                     # (K, h)
    any_col = masks.any(axis=1)                     # (K, w)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    big = jnp.int32(1 << 20)
    y1 = jnp.min(jnp.where(any_row, rows, big), axis=1)
    y2 = jnp.max(jnp.where(any_row, rows, -1), axis=1)
    x1 = jnp.min(jnp.where(any_col, cols, big), axis=1)
    x2 = jnp.max(jnp.where(any_col, cols, -1), axis=1)
    empty = ~masks.any(axis=(1, 2))
    box = jnp.stack([x1, y1, x2 + 1, y2 + 1], axis=1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, box)


@dataclasses.dataclass(frozen=True)
class AMGConfig:
    points_per_side: int = 16
    pred_iou_thresh: float = 0.88
    stability_score_thresh: float = 0.95
    stability_score_offset: float = 1.0
    mask_threshold: float = 0.0
    box_nms_thresh: float = 0.7
    max_masks: int = 64


class AutomaticMaskGenerator:
    """`generate(image)` -> dict of fixed-shape arrays:
    masks (K, h, w) bool, iou_preds (K,), stability (K,), boxes (K, 4),
    valid (K,) — K = cfg.max_masks, invalid slots zeroed."""

    def __init__(self, model: SamModel, params, cfg: AMGConfig = AMGConfig()):
        self.model = model
        self.params = params
        self.cfg = cfg
        grid = build_point_grid(cfg.points_per_side)
        self._grid = jnp.asarray(grid)

        def run(params, image):
            c = self.cfg
            h, w = image.shape[1:3]
            # all grid points as P independent 1-point prompts
            pts = self._grid * jnp.asarray([w, h], jnp.float32)
            pts = pts[None, :, None, :]                       # (1, P, 1, 2)
            logits, iou = self.model.apply(
                params, image, pts, None, None, True
            )                                                 # (1,P,3,s,s),(1,P,3)
            s = logits.shape[-1]
            logits = logits.reshape(-1, s, s)                 # (P*3, s, s)
            iou = iou.reshape(-1)
            stab = stability_score(
                logits, c.mask_threshold, c.stability_score_offset
            )
            masks = logits > c.mask_threshold
            boxes = _mask_boxes(masks)
            keepable = (
                (iou >= c.pred_iou_thresh)
                & (stab >= c.stability_score_thresh)
                & masks.any(axis=(1, 2))
            )
            # NMS over boxes, scored by predicted IoU; dead entries sunk
            scores = jnp.where(keepable, iou, -1.0)
            keep, valid = nms(boxes, scores, c.box_nms_thresh, c.max_masks)
            valid = valid & (scores[keep] > 0)
            return {
                "masks": masks[keep] & valid[:, None, None],
                "iou_preds": jnp.where(valid, iou[keep], 0.0),
                "stability": jnp.where(valid, stab[keep], 0.0),
                "boxes": boxes[keep] * valid[:, None],
                "valid": valid,
            }

        self._run = jax.jit(run)

    def generate(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """image: (H, W, 3) normalized float (the SamModel input
        contract).  Masks come back at the decoder's low resolution;
        upsample host-side if pixel-exact masks at H x W are needed."""
        out = self._run(self.params, jnp.asarray(image)[None])
        return {k: np.asarray(v) for k, v in out.items()}
