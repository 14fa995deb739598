"""Hand-object detector: Faster-RCNN with contact-state heads, TPU-native.

Rebuild of third_party/hand_object_detector (Faster-RCNN ResNet-101 with
hand/object boxes, contact state, and hand-side outputs — hod.py:59-106,
lib/model/faster_rcnn/) on our fixed-shape detection ops:

* ResNet-style backbone (GroupNorm — batch-stat-free, TPU-friendly);
* RPN over anchors (scales [8,16,32,64], ratios [0.5,1,2] — the HOD
  config) with our `ops.nms`;
* ROI-Align heads: class scores (background/targetobject/hand), box
  regression, and the HOD extras: 5-way contact state, offset vector,
  left/right hand side;
* `HOD.detect(image)` returns the reference dict
  {'hand-bbox': [...], 'obj-bbox': [...], 'state': [...], 'side': [...]}.

`HeuristicHOD` is the weight-free stand-in (skin-color + motion cues)
that keeps the stage-7 HOD-arbitration path exercised end to end.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.nms import box_iou, nms
from egoscaler_tpu.ops.roi_align import roi_align

ANCHOR_SCALES = (8, 16, 32, 64)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
CLASSES = ("__background__", "targetobject", "hand")


def make_anchors(
    feat_h: int,
    feat_w: int,
    stride: int = 16,
    scales: Sequence[float] = ANCHOR_SCALES,
    ratios: Sequence[float] = ANCHOR_RATIOS,
) -> jnp.ndarray:
    """(A*H*W, 4) anchors in image coords (HOD config scales/ratios)."""
    base = []
    for s in scales:
        for r in ratios:
            size = s * stride
            w = size * np.sqrt(1.0 / r)
            h = size * np.sqrt(r)
            base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = jnp.asarray(base)  # (A, 4)
    ys = (jnp.arange(feat_h) + 0.5) * stride
    xs = (jnp.arange(feat_w) + 0.5) * stride
    cx, cy = jnp.meshgrid(xs, ys)
    centers = jnp.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return (centers + base[None]).reshape(-1, 4)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Standard Faster-RCNN box decoding."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + aw / 2
    acy = anchors[:, 1] + ah / 2
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    cx = acx + dx * aw
    cy = acy + dy * ah
    w = aw * jnp.exp(jnp.clip(dw, -4, 4))
    h = ah * jnp.exp(jnp.clip(dh, -4, 4))
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    )


class ResStage(nn.Module):
    dim: int
    blocks: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            s = self.stride if i == 0 else 1
            h = nn.Conv(self.dim, (3, 3), strides=(s, s), padding=1,
                        name=f"b{i}_conv1")(x)
            h = nn.GroupNorm(num_groups=8, name=f"b{i}_gn1")(h)
            h = nn.relu(h)
            h = nn.Conv(self.dim, (3, 3), padding=1, name=f"b{i}_conv2")(h)
            h = nn.GroupNorm(num_groups=8, name=f"b{i}_gn2")(h)
            if s != 1 or x.shape[-1] != self.dim:
                x = nn.Conv(self.dim, (1, 1), strides=(s, s),
                            name=f"b{i}_skip")(x)
            x = nn.relu(x + h)
        return x


@dataclasses.dataclass(frozen=True)
class HODConfig:
    backbone_dim: int = 256
    roi_size: int = 7
    pre_nms_topk: int = 512
    post_nms_topk: int = 64
    rpn_nms_thresh: float = 0.7
    score_thresh: float = 0.5
    nms_thresh: float = 0.3
    num_contact_states: int = 5  # no/self/other/portable/stationary
    anchor_scales: Tuple[float, ...] = ANCHOR_SCALES
    anchor_ratios: Tuple[float, ...] = ANCHOR_RATIOS

    def tiny(self) -> "HODConfig":
        # small anchors: sized for the 128^2 synthetic training scenes
        return dataclasses.replace(
            self, backbone_dim=32, pre_nms_topk=64, post_nms_topk=16,
            anchor_scales=(1.0, 2.0, 4.0),
        )


class HandObjectRCNN(nn.Module):
    cfg: HODConfig

    @nn.compact
    def __call__(self, image: jax.Array):
        """(H, W, 3) in [0,1] -> detection dict with fixed-size outputs."""
        cfg = self.cfg
        h_img, w_img, _ = image.shape
        x = image[None]
        x = nn.Conv(cfg.backbone_dim // 4, (7, 7), strides=(2, 2), padding=3,
                    name="stem")(x)
        x = nn.GroupNorm(num_groups=8, name="stem_gn")(x)
        x = nn.relu(x)
        x = ResStage(cfg.backbone_dim // 2, 2, name="stage1")(x)
        x = ResStage(cfg.backbone_dim, 2, name="stage2")(x)
        x = ResStage(cfg.backbone_dim, 2, name="stage3")(x)  # stride 16
        feat = x[0]  # (h, w, C)
        fh, fw, _ = feat.shape

        # RPN
        rpn = nn.Conv(cfg.backbone_dim, (3, 3), padding=1, name="rpn_conv")(feat)
        rpn = nn.relu(rpn)
        a = len(cfg.anchor_scales) * len(cfg.anchor_ratios)
        logits = nn.Conv(a, (1, 1), name="rpn_cls")(rpn).reshape(-1)
        deltas = nn.Conv(a * 4, (1, 1), name="rpn_reg")(rpn).reshape(-1, 4)
        anchors = make_anchors(
            fh, fw, scales=cfg.anchor_scales, ratios=cfg.anchor_ratios
        )
        proposals = decode_boxes(anchors, deltas)
        proposals = jnp.stack(
            [
                proposals[:, 0].clip(0, w_img - 1),
                proposals[:, 1].clip(0, h_img - 1),
                proposals[:, 2].clip(0, w_img - 1),
                proposals[:, 3].clip(0, h_img - 1),
            ],
            axis=1,
        )
        top_scores, top_idx = jax.lax.top_k(
            logits, min(cfg.pre_nms_topk, logits.shape[0])
        )
        top_boxes = proposals[top_idx]
        keep, valid = nms(
            top_boxes, top_scores, cfg.rpn_nms_thresh, cfg.post_nms_topk
        )
        # detach: proposals are training targets, not a gradient path
        # (Faster-RCNN convention; RPN trains through its own anchor loss)
        rois = jax.lax.stop_gradient(top_boxes[keep])  # (post_nms_topk, 4)
        roi_valid = valid

        # ROI heads (feature coords = image / 16)
        pooled = roi_align(
            jnp.moveaxis(feat, -1, 0), rois / 16.0, cfg.roi_size
        )  # (R, C, s, s)
        flat = pooled.reshape(pooled.shape[0], -1)
        hdn = nn.Dense(cfg.backbone_dim * 2, name="head_fc1")(flat)
        hdn = nn.relu(hdn)
        hdn = nn.Dense(cfg.backbone_dim * 2, name="head_fc2")(hdn)
        hdn = nn.relu(hdn)
        cls_logits = nn.Dense(len(CLASSES), name="cls_score")(hdn)
        box_deltas = nn.Dense(4, name="bbox_pred")(hdn)
        contact = nn.Dense(cfg.num_contact_states, name="contact_state")(hdn)
        offset = nn.Dense(3, name="offset_vec")(hdn)  # dx, dy, magnitude
        side = nn.Dense(2, name="hand_side")(hdn)     # left/right

        boxes = decode_boxes(rois, box_deltas)
        return {
            "rois": rois,
            "roi_valid": roi_valid,
            "boxes": boxes,
            "cls_probs": jax.nn.softmax(cls_logits, axis=-1),
            "contact_probs": jax.nn.softmax(contact, axis=-1),
            "offset": offset,
            "side_probs": jax.nn.softmax(side, axis=-1),
            # raw pieces for the training losses (training/hod_train.py)
            "cls_logits": cls_logits,
            "contact_logits": contact,
            "side_logits": side,
            "box_deltas": box_deltas,
            "rpn_logits": logits,
            "rpn_deltas": deltas,
            "anchors": anchors,
        }


class HOD:
    """Reference-API wrapper (hod.py:59-106): detect() -> dict."""

    def __init__(self, cfg: Optional[HODConfig] = None, params=None,
                 rng_seed: int = 0, input_size: int = 512):
        self.cfg = cfg or HODConfig()
        self.model = HandObjectRCNN(self.cfg)
        self.input_size = input_size
        if params is None:
            dummy = jnp.zeros((input_size, input_size, 3), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(rng_seed), dummy)
        self.params = params
        self._fwd = jax.jit(self.model.apply)

    def detect(self, image: np.ndarray, thresh: Optional[float] = None) -> Dict:
        h, w = image.shape[:2]
        x = jax.image.resize(
            jnp.asarray(image, jnp.float32) / 255.0,
            (self.input_size, self.input_size, 3), method="linear",
        )
        out = self._fwd(self.params, x)
        thresh = thresh if thresh is not None else self.cfg.score_thresh
        sx = w / self.input_size
        sy = h / self.input_size
        boxes = np.asarray(out["boxes"]) * np.array([sx, sy, sx, sy])
        probs = np.asarray(out["cls_probs"])
        valid = np.asarray(out["roi_valid"])
        res = {"hand-bbox": [], "obj-bbox": [], "state": [], "side": []}
        for i in range(len(boxes)):
            if not valid[i]:
                continue
            cls = int(np.argmax(probs[i]))
            score = float(probs[i, cls])
            if cls == 0 or score < thresh:
                continue
            box = [int(v) for v in boxes[i]]
            if CLASSES[cls] == "hand":
                res["hand-bbox"].append(box + [score])
                res["state"].append(int(np.argmax(np.asarray(out["contact_probs"])[i])))
                res["side"].append(int(np.argmax(np.asarray(out["side_probs"])[i])))
            else:
                res["obj-bbox"].append(box)
        return res


class HeuristicHOD:
    """Skin-color + motion heuristic producing the hods/ dict without
    weights: hands = largest skin-toned regions; object = moving region
    nearest a hand."""

    def detect_clip(self, frames: np.ndarray) -> Dict:
        f0 = frames[0].astype(np.float32)
        r, g, b = f0[..., 0], f0[..., 1], f0[..., 2]
        skin = (r > 70) & (r > g) & (g > b) & (r - b > 20) & (r < 250)
        res = {"hand-bbox": [], "obj-bbox": [], "state": [], "side": []}
        ys, xs = np.nonzero(skin)
        if len(xs) > 50:
            res["hand-bbox"].append(
                [int(np.percentile(xs, 5)), int(np.percentile(ys, 5)),
                 int(np.percentile(xs, 95)), int(np.percentile(ys, 95)), 0.5]
            )
            res["state"].append(3)  # portable contact
            res["side"].append(1)
        if len(frames) > 1:
            diff = np.abs(
                frames[1].astype(np.float32).mean(-1) - f0.mean(-1)
            )
            m = diff > max(np.quantile(diff, 0.97) * 0.9, 8.0)
            ys, xs = np.nonzero(m)
            if len(xs) > 30:
                res["obj-bbox"].append(
                    [int(np.percentile(xs, 5)), int(np.percentile(ys, 5)),
                     int(np.percentile(xs, 95)), int(np.percentile(ys, 95))]
                )
        return res
