"""Hand-object detector bootstrap training run.

Trains models/hand_object.HandObjectRCNN (tiny config) on synthetic
hand-object scenes (training/hod_train.py) until it beats HeuristicHOD
on held-out scenes — the same quality bar the tracker uses
(scripts/train_tracker.py), standing in for the reference's pretrained
100-DOH Faster-RCNN weights (hod.py:59-106) under zero egress.

Writes egoscaler_tpu/assets/hod_synthetic.npz and HOD_QUALITY.json.

Usage: python scripts/train_hod.py [--steps 1200] [--platform cpu|tpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--eval-scenes", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import optax
    from flax import traverse_util

    from egoscaler_tpu.models.hand_object import HandObjectRCNN, HODConfig
    from egoscaler_tpu.training.hod_train import (
        eval_detector,
        eval_heuristic,
        make_hod_train_step,
        scene_batch,
        synthetic_hand_scene,
    )

    cfg = HODConfig().tiny()
    model = HandObjectRCNN(cfg)
    rng = np.random.default_rng(0)

    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((args.size, args.size, 3), jnp.float32)
    )
    warmup = min(100, max(args.steps // 10, 1))
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup, max(args.steps, warmup + 1)
        ),
        weight_decay=1e-4,
    )
    opt_state = tx.init(params)
    step = make_hod_train_step(model, tx)

    t0 = time.time()
    for i in range(args.steps):
        batch = scene_batch(rng, args.batch, args.size)
        batch.pop("scenes")
        params, opt_state, loss, metrics = step(params, opt_state, batch)
        if i % 100 == 0 or i == args.steps - 1:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(f"step {i} loss {float(loss):.4f} {m} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval (fresh generator seed)
    erng = np.random.default_rng(12345)
    scenes = [synthetic_hand_scene(erng, args.size) for _ in range(args.eval_scenes)]
    ours = eval_detector(model, params, scenes)
    heur = eval_heuristic(scenes)
    report = {"trained": ours, "heuristic": heur, "steps": args.steps}
    print(json.dumps(report, indent=2))

    flat = traverse_util.flatten_dict(params, sep="/")
    np.savez(
        os.path.join(REPO, "egoscaler_tpu", "assets", "hod_synthetic.npz"),
        **{k: np.asarray(v) for k, v in flat.items()},
    )
    with open(os.path.join(REPO, "HOD_QUALITY.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
