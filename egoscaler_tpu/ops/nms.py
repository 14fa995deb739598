"""Non-maximum suppression, XLA-friendly (fixed shapes, no host sync).

Reference: hand_object_detector's CUDA/CPU NMS kernels
(lib/model/nms/src/nms_cuda_kernel.cu etc., SURVEY.md §2.3).  TPU
approach: one batched IoU matrix + an iterative suppress loop over a
static budget — scores and boxes stay on device, output is a fixed-size
index list + validity mask.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N,4) x (M,4) [x1,y1,x2,y2] -> (N,M) IoU."""
    area_a = (a[:, 2] - a[:, 0]).clip(0) * (a[:, 3] - a[:, 1]).clip(0)
    area_b = (b[:, 2] - b[:, 0]).clip(0) * (b[:, 3] - b[:, 1]).clip(0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    score_threshold: float = -jnp.inf,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS.  Returns (keep_indices (max_outputs,), valid mask).

    Identical selection to torchvision/CUDA nms: iterate boxes by score,
    suppress any remaining box with IoU > threshold vs the kept one.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    alive = scores > score_threshold

    def body(carry, _):
        alive, = carry
        masked_scores = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked_scores)
        any_alive = jnp.any(alive)
        # suppress overlaps with the selected box (including itself)
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress & (jnp.arange(n) != best)
        out_idx = jnp.where(any_alive, best, -1)
        return (alive,), out_idx

    (_,), keep = jax.lax.scan(body, (alive,), None, length=max_outputs)
    valid = keep >= 0
    return jnp.where(valid, keep, 0).astype(jnp.int32), valid
