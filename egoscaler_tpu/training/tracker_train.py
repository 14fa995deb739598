"""Tracker training: supervised / distillation losses + train step.

The reference ships SpaTracker weights; our TPU-first tracker
(models/tracker.py) trains from synthetic supervision or by distilling
reference-tracker outputs (SURVEY.md §5.4 note on checkpoint families).
Losses follow the CoTracker/SpaTracker recipe: Huber on track
coordinates (xy in pixels, z in meters, weighted), BCE on visibility.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from egoscaler_tpu.models.tracker import SpaTracker, TrackerConfig


def huber(x: jax.Array, delta: float = 6.0) -> jax.Array:
    a = jnp.abs(x)
    return jnp.where(a <= delta, 0.5 * a * a, delta * (a - 0.5 * delta))


def tracking_loss(
    pred_tracks: jax.Array,   # (T, Q, 3)
    pred_vis: jax.Array,      # (T, Q) in (0, 1)
    gt_tracks: jax.Array,     # (T, Q, 3)
    gt_vis: jax.Array,        # (T, Q) bool
    z_weight: float = 10.0,   # meters vs pixels scale balance
) -> Dict[str, jax.Array]:
    w = gt_vis.astype(jnp.float32)
    xy_err = huber(pred_tracks[..., :2] - gt_tracks[..., :2]).sum(-1)
    z_err = huber(
        (pred_tracks[..., 2] - gt_tracks[..., 2]) * z_weight, delta=2.0
    )
    coord = jnp.sum((xy_err + z_err) * w) / jnp.sum(w).clip(1.0)
    vis = optax.sigmoid_binary_cross_entropy(
        jnp.log(pred_vis.clip(1e-6, 1 - 1e-6))
        - jnp.log1p(-pred_vis.clip(1e-6, 1 - 1e-6)),
        gt_vis.astype(jnp.float32),
    ).mean()
    return {"coord": coord, "vis": vis, "total": coord + vis}


def make_tracker_train_step(
    model: SpaTracker, tx: optax.GradientTransformation
) -> Callable:
    def loss_fn(params, batch):
        tracks, vis = model.apply(
            params, batch["clip"], batch["depths"], batch["queries"]
        )
        losses = tracking_loss(
            tracks, vis, batch["gt_tracks"], batch["gt_vis"]
        )
        return losses["total"], losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(params, opt_state, batch):
        (_, losses), grads = grad_fn(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return step


def lk_pseudo_labels(clip, depths, queries, visibility_margin: float = 4.0):
    """Distillation targets from the pyramidal-LK tracker
    (ops/lucas_kanade.py): tracks + a visibility proxy (in-frame with
    margin).  Lets the learned tracker bootstrap without reference
    weights; swap in reference-tracker outputs for true distillation."""
    import jax.numpy as jnp

    from egoscaler_tpu.ops.lucas_kanade import lk_track_clip

    tracks = lk_track_clip(clip, depths, queries[:, :2])
    t, h, w, _ = clip.shape
    m = visibility_margin
    vis = (
        (tracks[..., 0] >= m) & (tracks[..., 0] < w - m)
        & (tracks[..., 1] >= m) & (tracks[..., 1] < h - m)
    )
    return tracks, vis


def distill_step_fn(model: SpaTracker, tx: optax.GradientTransformation):
    """Train step where targets come packed in the batch (from LK or a
    reference tracker)."""
    return make_tracker_train_step(model, tx)


def synthetic_tracking_batch(rng, t=4, h=48, w=48, q=6):
    """Textured drifting scene with known tracks, for tests/smoke
    training."""
    import numpy as np

    base = rng.normal(size=(h // 4, w // 4, 3))
    img = np.asarray(
        jax.image.resize(jnp.asarray(base), (h, w, 3), method="bicubic")
    )
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    clip, gt = [], []
    q0 = np.stack(
        [rng.uniform(10, w - 10, q), rng.uniform(10, h - 10, q)], axis=1
    ).astype(np.float32)
    for ti in range(t):
        dx, dy = 0.7 * ti, 0.3 * ti
        ys = np.clip(np.arange(h) - dy, 0, h - 1).astype(int)
        xs = np.clip(np.arange(w) - dx, 0, w - 1).astype(int)
        clip.append(img[ys][:, xs])
        gt.append(
            np.concatenate(
                [q0 + [dx, dy], np.full((q, 1), 2.0, np.float32)], axis=1
            )
        )
    return {
        "clip": jnp.asarray(np.stack(clip), jnp.float32),
        "depths": jnp.full((t, h, w), 2.0, jnp.float32),
        "queries": jnp.asarray(
            np.concatenate([q0, np.full((q, 1), 2.0, np.float32)], axis=1)
        ),
        "gt_tracks": jnp.asarray(np.stack(gt)),
        "gt_vis": jnp.ones((t, q), bool),
    }


def occlusion_tracking_batch(rng, t=8, h=64, w=64, q=8, occlude=True):
    """Textured moving patch whose tracked points pass behind a solid
    occluder mid-clip and reappear — the regime where frame-pair LK
    loses tracks but a window tracker (temporal attention over the whole
    clip, SpaTracker predictor.py:222 behavior) can hold them.

    Returns a training batch dict; gt_vis is False under the occluder.
    """
    import numpy as np

    # textured background + textured target patch
    def texture(hh, ww, scale=4):
        base = rng.normal(size=(hh // scale, ww // scale, 3))
        img = np.asarray(
            jax.image.resize(jnp.asarray(base), (hh, ww, 3), method="bicubic")
        )
        return (img - img.min()) / (img.max() - img.min() + 1e-9)

    bg = texture(h, w)
    ph, pw = h // 4, w // 4
    patch = texture(ph, pw, scale=2)

    # patch moves linearly; queries are points on the patch
    x0, y0 = w // 8, h // 2 - ph // 2
    vx, vy = rng.uniform(1.5, 3.0), rng.uniform(-0.8, 0.8)
    qx = rng.uniform(2, pw - 2, q).astype(np.float32)
    qy = rng.uniform(2, ph - 2, q).astype(np.float32)

    occ_w = w // 3
    occ_color = rng.uniform(0.0, 1.0, 3).astype(np.float32)

    clip, gt, vis = [], [], []
    for ti in range(t):
        frame = bg.copy()
        px = int(round(x0 + vx * ti))
        py = int(round(y0 + vy * ti))
        frame[py : py + ph, px : px + pw] = patch
        gx = qx + (x0 + vx * ti)
        gy = qy + (y0 + vy * ti)
        v = np.ones(q, bool)
        if occlude and t // 3 <= ti < 2 * t // 3:
            # occluder covers the patch region in the middle third
            ox = max(px - 2, 0)
            frame[:, ox : ox + occ_w] = occ_color
            v[:] = (gx < ox) | (gx >= ox + occ_w)
        clip.append(frame)
        gt.append(
            np.concatenate(
                [np.stack([gx, gy], 1), np.full((q, 1), 2.0, np.float32)], 1
            )
        )
        vis.append(v)

    return {
        "clip": jnp.asarray(np.stack(clip), jnp.float32),
        "depths": jnp.full((t, h, w), 2.0, jnp.float32),
        "queries": jnp.asarray(gt[0]),
        "gt_tracks": jnp.asarray(np.stack(gt)),
        "gt_vis": jnp.asarray(np.stack(vis)),
    }


def hard_tracking_batch(rng, t=12, h=96, w=96, q=16, n_obj=3,
                        occ_frac=0.5):
    """Round-4 scaled-tracker corpus: MULTI-object, textured occluder,
    longer occlusions, real depth structure.

    n_obj textured patches move at distinct velocities on distinct
    depth planes over a textured background; queries are split across
    the objects; a TEXTURED vertical occluder strip (nearest depth)
    covers the middle ``occ_frac`` of the clip; a query is invisible
    when the occluder or a NEARER object's extent covers it.  The depth
    map carries the per-object planes, so the triplane encoder sees
    genuine z structure (the flat-depth corpora above cannot train the
    XZ/YZ planes).  This is the training regime the reference's
    SpaTracker checkpoint saw in spirit: cluttered scenes, entity
    occlusion, metric depth (spatracker.py:103-733 trains on Kubric).
    """
    import numpy as np

    def texture(hh, ww, scale=4):
        base = rng.normal(size=(max(hh // scale, 2), max(ww // scale, 2), 3))
        img = np.asarray(
            jax.image.resize(jnp.asarray(base), (hh, ww, 3), method="bicubic")
        )
        return (img - img.min()) / (img.max() - img.min() + 1e-9)

    bg = texture(h, w)
    z_bg = 3.0 + 0.4 * np.linspace(0, 1, h)[:, None] * np.ones((1, w))

    ph, pw = h // 5, w // 5
    objs = []
    for i in range(n_obj):
        objs.append({
            "patch": texture(ph, pw, scale=2),
            "z": float(rng.uniform(1.2, 2.6)),
            "x0": float(rng.uniform(2, w - pw - 2 - 3.0 * t)),
            "y0": float(rng.uniform(2, h - ph - 2)),
            "vx": float(rng.uniform(0.8, 3.0)),
            "vy": float(rng.uniform(-0.8, 0.8)),
        })
    objs.sort(key=lambda o: -o["z"])  # paint far -> near

    # queries split across objects (local patch coordinates)
    per = [q // n_obj + (1 if i < q % n_obj else 0) for i in range(n_obj)]
    q_obj, q_loc = [], []
    for i, n in enumerate(per):
        q_obj.extend([i] * n)
        q_loc.append(np.stack([
            rng.uniform(2, pw - 2, n), rng.uniform(2, ph - 2, n)
        ], axis=1))
    q_obj = np.asarray(q_obj)
    q_loc = np.concatenate(q_loc).astype(np.float32)

    occ_w = w // 3
    occ_tex = texture(h, occ_w, scale=3)
    # center the strip on a tracked object's mid-clip position so the
    # occlusion actually happens (random placement mostly misses)
    tgt = objs[int(rng.integers(0, n_obj))]
    mid_x = tgt["x0"] + tgt["vx"] * (t / 2) + pw / 2
    occ_x = int(np.clip(mid_x - occ_w / 2, 0, w - occ_w))
    occ_lo = int(round(t * (0.5 - occ_frac / 2)))
    occ_hi = int(round(t * (0.5 + occ_frac / 2)))

    clip, depths, gt, vis = [], [], [], []
    for ti in range(t):
        frame = bg.copy()
        depth = z_bg.copy()
        boxes = []  # (x, y, z) extents after painting, near-last
        for o in objs:
            px = int(round(o["x0"] + o["vx"] * ti))
            py = int(round(o["y0"] + o["vy"] * ti))
            px = np.clip(px, 0, w - pw)
            py = np.clip(py, 0, h - ph)
            frame[py:py + ph, px:px + pw] = o["patch"]
            depth[py:py + ph, px:px + pw] = o["z"]
            boxes.append((px, py, o["z"]))
        occluded_frame = occ_lo <= ti < occ_hi
        if occluded_frame:
            frame[:, occ_x:occ_x + occ_w] = occ_tex
            depth[:, occ_x:occ_x + occ_w] = 0.8

        gx = np.empty(q, np.float32)
        gy = np.empty(q, np.float32)
        gz = np.empty(q, np.float32)
        v = np.ones(q, bool)
        for k in range(q):
            o = objs[q_obj[k]]
            x = q_loc[k, 0] + np.clip(
                o["x0"] + o["vx"] * ti, 0, w - pw
            )
            y = q_loc[k, 1] + np.clip(
                o["y0"] + o["vy"] * ti, 0, h - ph
            )
            gx[k], gy[k], gz[k] = x, y, o["z"]
            # hidden by a NEARER object's extent?
            for (bx, by, bz) in boxes:
                if bz < o["z"] and bx <= x < bx + pw and by <= y < by + ph:
                    v[k] = False
            if occluded_frame and occ_x <= x < occ_x + occ_w:
                v[k] = False
        clip.append(frame)
        depths.append(depth)
        gt.append(np.stack([gx, gy, gz], axis=1))
        vis.append(v)

    return {
        "clip": jnp.asarray(np.stack(clip), jnp.float32),
        "depths": jnp.asarray(np.stack(depths), jnp.float32),
        "queries": jnp.asarray(gt[0]),
        "gt_tracks": jnp.asarray(np.stack(gt)),
        "gt_vis": jnp.asarray(np.stack(vis)),
    }
