"""Hand-object detector training: synthetic scenes + Faster-RCNN losses.

The reference ships hand_object_detector with pretrained 100-DOH weights
(third_party/hand_object_detector/lib/model/faster_rcnn/faster_rcnn.py,
hod.py:59-106); zero-egress means no checkpoint, so — like the tracker
(training/tracker_train.py) — we establish detector quality by training
models/hand_object.HandObjectRCNN on procedurally generated hand-object
scenes until it beats the weight-free HeuristicHOD on held-out scenes.

Scenes are built to exhibit the heuristic's real failure modes: skin-tone
distractor patches (wood, cardboard) that the color rule merges into the
hand box, and motion blur that smears the frame-difference object box.

All losses are fixed-shape and jit-friendly: anchor/roi matching is done
with masked means, never boolean indexing.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from egoscaler_tpu.models.hand_object import HandObjectRCNN
from egoscaler_tpu.ops.nms import box_iou

# ---------------------------------------------------------------------------
# synthetic scenes


def _ellipse_mask(h, w, cy, cx, ry, rx, angle):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ca, sa = np.cos(angle), np.sin(angle)
    u = (xx - cx) * ca + (yy - cy) * sa
    v = -(xx - cx) * sa + (yy - cy) * ca
    return (u / rx) ** 2 + (v / ry) ** 2 <= 1.0


def _mask_box(mask) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    return np.array(
        [xs.min(), ys.min(), xs.max(), ys.max()], np.float32
    )


def synthetic_hand_scene(rng: np.random.Generator, size: int = 128) -> Dict:
    """One 2-frame clip: textured background + skin-tone distractors +
    hand (side-dependent finger direction) + optionally a moving object
    in or out of contact.  Returns images uint8 and GT annotations."""
    h = w = size
    # wood-ish background with low-frequency texture
    base = np.array(
        [rng.uniform(95, 135), rng.uniform(70, 95), rng.uniform(45, 65)],
        np.float32,
    )
    tex = rng.normal(0, 6, size=(h // 8, w // 8, 3)).astype(np.float32)
    tex = np.kron(tex, np.ones((8, 8, 1), np.float32))
    img = np.clip(base[None, None] + tex, 0, 255)

    # skin-tone distractor patches (pass the r>g>b color rule)
    for _ in range(rng.integers(2, 4)):
        cy, cx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        m = _ellipse_mask(h, w, cy, cx, rng.uniform(6, 14),
                          rng.uniform(6, 14), rng.uniform(0, np.pi))
        col = np.array(
            [rng.uniform(150, 180), rng.uniform(110, 135), rng.uniform(80, 105)],
            np.float32,
        )
        img[m] = col

    # hand: palm ellipse + finger bumps pointing left or right by side
    side = int(rng.integers(0, 2))  # 0 = left hand, 1 = right hand
    ry, rx = rng.uniform(12, 18), rng.uniform(9, 13)
    cy = rng.uniform(ry + 8, h - ry - 8)
    cx = rng.uniform(rx + 14, w - rx - 14)
    hand = _ellipse_mask(h, w, cy, cx, ry, rx, rng.uniform(-0.3, 0.3))
    fdir = -1.0 if side == 0 else 1.0  # fingers extend toward the thumb side
    for k in range(3):
        fy = cy + (k - 1) * ry * 0.5
        fx = cx + fdir * (rx + 4)
        hand |= _ellipse_mask(h, w, fy, fx, 2.5, 6.0, 0.0)
    skin = np.array(
        [rng.uniform(195, 225), rng.uniform(140, 165), rng.uniform(110, 130)],
        np.float32,
    )
    img_hand = img.copy()
    img_hand[hand] = skin + rng.normal(0, 4, size=(int(hand.sum()), 3))
    hand_box = _mask_box(hand)

    # object: saturated non-skin block, in contact (adjacent) or apart
    contact = int(rng.integers(0, 2))
    oh, ow = rng.uniform(8, 16), rng.uniform(8, 16)
    if contact:
        ocy = cy + rng.uniform(-ry, ry)
        ocx = cx + fdir * (rx + 8 + ow * 0.4)
    else:
        ocy = rng.uniform(oh + 4, h - oh - 4)
        ocx = (cx + w / 2 + rng.uniform(-20, 20)) % (w - 2 * ow - 8) + ow + 4
    ocy = float(np.clip(ocy, oh + 2, h - oh - 3))
    ocx = float(np.clip(ocx, ow + 2, w - ow - 3))
    obj = _ellipse_mask(h, w, ocy, ocx, oh, ow, rng.uniform(0, np.pi))
    hue = rng.integers(0, 2)
    col = (
        np.array([rng.uniform(20, 60), rng.uniform(90, 140), rng.uniform(170, 220)])
        if hue else
        np.array([rng.uniform(20, 60), rng.uniform(150, 200), rng.uniform(60, 100)])
    ).astype(np.float32)
    f0 = img_hand.copy()
    f0[obj] = col
    obj_box = _mask_box(obj)

    # frame 2: object (and hand if holding) shifted — motion for the
    # heuristic's frame-difference rule, smeared over both positions
    dy, dx = rng.uniform(-6, 6), rng.uniform(4, 9) * rng.choice([-1, 1])
    obj2 = _ellipse_mask(h, w, ocy + dy, ocx + dx, oh, ow, 0.0)
    f1 = img_hand.copy()
    f1[obj2] = col

    return {
        "clip": np.stack([f0, f1]).astype(np.uint8),
        "hand_box": hand_box,
        "obj_box": obj_box,
        "contact": contact,   # 0 = none, 1 = portable contact
        "side": side,
    }


def scene_batch(rng: np.random.Generator, n: int, size: int = 128) -> Dict:
    scenes = [synthetic_hand_scene(rng, size) for _ in range(n)]
    return {
        "images": np.stack([s["clip"][0] for s in scenes]).astype(np.float32) / 255.0,
        "hand_box": np.stack([s["hand_box"] for s in scenes]),
        "obj_box": np.stack([s["obj_box"] for s in scenes]),
        "contact": np.array([s["contact"] for s in scenes], np.int32),
        "side": np.array([s["side"] for s in scenes], np.int32),
        "scenes": scenes,
    }


# ---------------------------------------------------------------------------
# losses


def encode_boxes(ref: jax.Array, gt: jax.Array) -> jax.Array:
    """Inverse of models.hand_object.decode_boxes."""
    rw = jnp.maximum(ref[:, 2] - ref[:, 0], 1.0)
    rh = jnp.maximum(ref[:, 3] - ref[:, 1], 1.0)
    rcx = ref[:, 0] + rw / 2
    rcy = ref[:, 1] + rh / 2
    gw = jnp.maximum(gt[:, 2] - gt[:, 0], 1.0)
    gh = jnp.maximum(gt[:, 3] - gt[:, 1], 1.0)
    gcx = gt[:, 0] + gw / 2
    gcy = gt[:, 1] + gh / 2
    return jnp.stack(
        [(gcx - rcx) / rw, (gcy - rcy) / rh, jnp.log(gw / rw), jnp.log(gh / rh)],
        axis=1,
    )


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def hod_loss(model: HandObjectRCNN, params, batch) -> Tuple[jax.Array, Dict]:
    """Faster-RCNN multi-task loss on one image, vmapped over the batch.

    RPN anchor matching (pos IoU>0.5 or argmax per GT, neg IoU<0.3) +
    head roi matching (pos IoU>0.5) exactly as the reference trainer
    (lib/model/rpn/anchor_target_layer.py, proposal_target_layer.py
    semantics), reduced with masks instead of sampling for fixed shapes.
    """

    def one(image, hand_box, obj_box, contact, side):
        out = model.apply(params, image)
        gts = jnp.stack([hand_box, obj_box])                    # (2, 4)
        iou_a = box_iou(out["anchors"], gts)                    # (A, 2)
        best_iou = iou_a.max(axis=1)
        best_gt = iou_a.argmax(axis=1)
        pos = best_iou > 0.5
        # guarantee each GT its best anchor
        pos = pos | jnp.zeros_like(pos).at[iou_a.argmax(axis=0)].set(True)
        neg = (best_iou < 0.3) & ~pos

        tgt = (pos).astype(jnp.float32)
        rpn_bce = optax.sigmoid_binary_cross_entropy(out["rpn_logits"], tgt)
        wsum = lambda v, m: (v * m).sum() / jnp.maximum(m.sum(), 1.0)
        rpn_cls = wsum(rpn_bce, (pos | neg).astype(jnp.float32))
        enc = encode_boxes(out["anchors"], gts[best_gt])
        rpn_reg = wsum(
            _smooth_l1(out["rpn_deltas"] - enc).sum(-1), pos.astype(jnp.float32)
        )

        rois = out["rois"]
        iou_r = box_iou(rois, gts)                              # (R, 2)
        best_r = iou_r.max(axis=1)
        gt_idx = iou_r.argmax(axis=1)
        # labels: 0 bg, 1 targetobject, 2 hand (CLASSES order)
        label = jnp.where(best_r > 0.5, jnp.where(gt_idx == 0, 2, 1), 0)
        rv = out["roi_valid"].astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels
        head_cls = wsum(ce(out["cls_logits"], label), rv)
        enc_r = encode_boxes(rois, gts[gt_idx])
        fg = (label > 0).astype(jnp.float32) * rv
        head_reg = wsum(_smooth_l1(out["box_deltas"] - enc_r).sum(-1), fg)
        hand_m = (label == 2).astype(jnp.float32) * rv
        # contact states: 0 = none, 3 = portable (hod.py state vocabulary)
        state = jnp.where(contact > 0, 3, 0)
        c_loss = wsum(ce(out["contact_logits"], jnp.full_like(label, state)), hand_m)
        s_loss = wsum(ce(out["side_logits"], jnp.full_like(label, side)), hand_m)
        return rpn_cls + rpn_reg + head_cls + head_reg + 0.5 * (c_loss + s_loss), {
            "rpn_cls": rpn_cls, "rpn_reg": rpn_reg,
            "head_cls": head_cls, "head_reg": head_reg,
            "contact": c_loss, "side": s_loss,
        }

    losses, metrics = jax.vmap(one)(
        batch["images"], batch["hand_box"], batch["obj_box"],
        batch["contact"], batch["side"],
    )
    return losses.mean(), jax.tree_util.tree_map(jnp.mean, metrics)


def make_hod_train_step(model: HandObjectRCNN, tx):
    @jax.jit
    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: hod_loss(model, p, batch), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    return step


# ---------------------------------------------------------------------------
# evaluation


def _iou_np(a, b) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return float(inter / max(ua, 1e-9))


def eval_detector(model: HandObjectRCNN, params, scenes) -> Dict:
    """Mean hand/object IoU + side accuracy of the best-scoring boxes."""
    fwd = jax.jit(lambda img: model.apply(params, img))
    hand_ious, obj_ious, side_ok = [], [], []
    for s in scenes:
        img = jnp.asarray(s["clip"][0], jnp.float32) / 255.0
        out = jax.tree_util.tree_map(np.asarray, fwd(img))
        probs = out["cls_probs"] * out["roi_valid"][:, None]
        hi = int(np.argmax(probs[:, 2]))
        oi = int(np.argmax(probs[:, 1]))
        hand_ious.append(_iou_np(out["boxes"][hi], s["hand_box"]))
        obj_ious.append(_iou_np(out["boxes"][oi], s["obj_box"]))
        side_ok.append(int(np.argmax(out["side_logits"][hi])) == s["side"])
    return {
        "hand_iou": float(np.mean(hand_ious)),
        "obj_iou": float(np.mean(obj_ious)),
        "side_acc": float(np.mean(side_ok)),
    }


def eval_heuristic(scenes) -> Dict:
    from egoscaler_tpu.models.hand_object import HeuristicHOD

    hod = HeuristicHOD()
    hand_ious, obj_ious = [], []
    for s in scenes:
        res = hod.detect_clip(s["clip"])
        hb = res["hand-bbox"][0][:4] if res["hand-bbox"] else [0, 0, 1, 1]
        ob = res["obj-bbox"][0][:4] if res["obj-bbox"] else [0, 0, 1, 1]
        hand_ious.append(_iou_np(np.asarray(hb, np.float32), s["hand_box"]))
        obj_ious.append(_iou_np(np.asarray(ob, np.float32), s["obj_box"]))
    return {
        "hand_iou": float(np.mean(hand_ious)),
        "obj_iou": float(np.mean(obj_ious)),
    }
