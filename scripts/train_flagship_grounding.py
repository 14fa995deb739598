"""Flagship (1.1B) generalization run on the language-grounded corpus.

synthetic_structured_samples ties the trajectory deterministically to
(verb, named-object position): the model must find the named object's
color cluster in the point cloud and map the verb to a motion.  Held-out
val ADE therefore measures multimodal GROUNDING generalization — unlike
the random-walk corpus, where only memorization is possible.

The point backbone trains from random init (the reference recipe
freezes it because it loads *pretrained* PointBERT weights,
model_arch.py:33-51; with no pretrained checkpoint on a zero-egress
host, unfreezing is the honest analogue).

Writes GROUNDING_FLAGSHIP.json at the repo root:
  {baseline_ade, val_ade, val_fde, val_gd, train_loss, steps, ...}

Usage: python scripts/train_flagship_grounding.py [--tiny] [--epochs N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config on CPU")
    ap.add_argument("--train_n", type=int, default=1024)
    ap.add_argument("--val_n", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--eval_every", type=int, default=4)
    ap.add_argument("--out", default="GROUNDING_FLAGSHIP.json")
    ap.add_argument("--unfreeze_lm", action="store_true",
                    help="train the LLM trunk too (required for grounding "
                         "from RANDOM init: the reference freeze recipe "
                         "presumes pretrained LLaMA weights)")
    ap.add_argument("--align_epochs", type=int, default=0,
                    help="stage-1-style alignment pretraining: N epochs on "
                         "the 'point to the X' locate corpus before the "
                         "trajectory fine-tune (PointLLM two-stage recipe, "
                         "pointllm/train/train.py:118-168)")
    ap.add_argument("--align_n", type=int, default=8192,
                    help="locate-corpus size for the alignment stage")
    ap.add_argument("--align_lr", type=float, default=4e-4)
    ap.add_argument("--save_dir", default="",
                    help="if set, dump best-ADE params (full_params tree, "
                         "flattened npz, f32) for downstream runs — e.g. "
                         "the speculative-decoding bench needs a TRAINED "
                         "target model for meaningful acceptance rates")
    ap.add_argument("--init_ckpt", default="",
                    help="flattened best_params.npz to initialize from "
                         "(resume after a relay wedge killed a run "
                         "mid-fine-tune; pair with --align_epochs 0 and "
                         "--resume_align_json to keep the align history)")
    ap.add_argument("--resume_align_json", default="",
                    help="prior --out artifact whose align_history is "
                         "carried into this run (only with "
                         "--align_epochs 0)")
    ap.add_argument("--locate_mix", type=float, default=0.0,
                    help="fraction of locate samples MIXED into the "
                         "fine-tune corpus (multi-task alternative to the "
                         "two-stage recipe)")
    ap.add_argument("--snapshot_dir", default="",
                    help="if set, write a FULL train-state snapshot "
                         "(params + Adam moments + schedule step, "
                         "training/snapshot.py) after every epoch; with "
                         "--resume a wedge-killed run continues the SAME "
                         "schedule instead of warm-restarting the "
                         "optimizer (the failure mode blamed for round "
                         "4's transfer-gate miss)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --snapshot_dir's snapshot if one "
                         "exists (no-op otherwise)")
    args = ap.parse_args()
    if args.init_ckpt and not (args.unfreeze_lm and not args.tiny):
        # ADVICE r4: --init_ckpt was silently ignored outside the
        # unfreeze_lm non-tiny branch — fail loudly instead
        ap.error("--init_ckpt is only consumed with --unfreeze_lm and "
                 "without --tiny; as given it would silently train from "
                 "random init")

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
    from egoscaler_tpu.models.pointllm import TrajPointLLM
    from egoscaler_tpu.training.dataset import (
        BatchLayout,
        TrajectoryDataset,
        mean_predictor_ade,
        repeat_wp0_baseline,
        synthetic_locate_samples,
        synthetic_structured_samples,
    )
    from egoscaler_tpu.training.evaluate import evaluate
    from egoscaler_tpu.training.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg = PointLLMConfig().tiny() if args.tiny else (
        PointLLMConfig().flagship_tpu()
    )
    train_s = synthetic_structured_samples(cfg, args.train_n, seed=0)
    if args.locate_mix > 0.0:
        n_loc = int(args.train_n * args.locate_mix)
        train_s = train_s + synthetic_locate_samples(cfg, n_loc, seed=77)
    val_s = synthetic_structured_samples(cfg, args.val_n, seed=10_000)
    transfer_s = [s for s in val_s if " onto " in s.description]
    baseline = mean_predictor_ade(train_s, val_s)
    wp0_all = repeat_wp0_baseline(val_s)
    wp0_transfer = repeat_wp0_baseline(transfer_s)
    print(f"baselines: mean-pred ADE {baseline:.4f}; repeat-wp0 "
          f"ade/fde {wp0_all} (transfer subset {wp0_transfer})", flush=True)

    tds = TrajectoryDataset(cfg, samples=train_s, seed=0)
    vds = TrajectoryDataset(cfg, samples=val_s, seed=1)
    # endpoint-grounding probe: FDE here requires reading object B's
    # position off the point cloud (it appears nowhere in the text)
    xds = TrajectoryDataset(cfg, samples=transfer_s, seed=2)
    model = TrajPointLLM(cfg, remat=not args.tiny)
    tcfg = TrainConfig(
        batch_size=args.bs, lr=args.lr, unfreeze_pc_encoder=True,
        unfreeze_language_model=args.unfreeze_lm,
    )
    lay = BatchLayout(cfg)
    steps_per_epoch = len(tds) // args.bs
    total_steps = steps_per_epoch * args.epochs

    sample = next(tds.batches(args.bs, shuffle=False))
    sample = {k: jnp.asarray(v) for k, v in sample.items()
              if k in ("input_ids", "attention_mask", "point_clouds")}
    if args.unfreeze_lm and not args.tiny:
        # full-unfreeze Adam at 1.1B f32 needs ~21 GB (params 4.4 +
        # moments 8.8 + grads + activations) vs 15.75 GB HBM: train in
        # bf16 end-to-end, the reference's precision for this family
        # anyway (train.py:91-104 bf16).  Cast params BEFORE the
        # optimizer init so the f32 moments never materialize.
        from egoscaler_tpu.training.trainer import (
            TrainState,
            frozen_patterns,
            make_optimizer,
            partition_params,
        )

        if args.init_ckpt:
            # resume path: the saved tree IS full_params() (same
            # structure as model.init's variables), f16 on disk
            from flax import traverse_util

            with np.load(args.init_ckpt) as z:
                flat = {k: jnp.asarray(z[k], jnp.bfloat16)
                        for k in z.files}
            variables = traverse_util.unflatten_dict(flat, sep="/")
            print(f"initialized params from {args.init_ckpt}", flush=True)
        else:
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(42),
                sample["input_ids"], sample["point_clouds"],
            )
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, variables
            )
        trainable, frozen = partition_params(
            variables, frozen_patterns(tcfg)
        )
        tx = make_optimizer(tcfg, total_steps)
        state = TrainState(
            trainable, frozen, tx.init(trainable),
            jnp.asarray(0, jnp.int32),
        )
    else:
        state, tx = create_train_state(
            model, tcfg, jax.random.PRNGKey(42), sample, total_steps
        )
    step_fn = make_train_step(model, tx, lay.prompt_len, 1)

    # ---- full-state crash resume (snapshot carries optimizer + step)
    snap_path = (os.path.join(args.snapshot_dir, "train_state.npz")
                 if args.snapshot_dir else "")
    if snap_path:
        os.makedirs(args.snapshot_dir, exist_ok=True)
    resume_meta = None
    if args.resume:
        assert snap_path, "--resume requires --snapshot_dir"
        if os.path.exists(snap_path):
            from egoscaler_tpu.training.snapshot import peek_snapshot_meta

            resume_meta = peek_snapshot_meta(snap_path)
            print(f"resuming from snapshot: {resume_meta}", flush=True)
        else:
            print("no snapshot found — starting fresh", flush=True)

    t0 = time.time()
    align_history = []
    history = []
    resumed_from = ""
    if resume_meta and os.path.exists(args.out):
        # carry the per-epoch history the wedged run already dumped
        with open(args.out) as f:
            prev = json.load(f)
        align_history = prev.get("align_history", [])
        history = prev.get("history", [])
        resumed_from = f"snapshot {snap_path} at {resume_meta}"
    if (args.resume_align_json and args.align_epochs == 0
            and os.path.exists(args.resume_align_json)):
        with open(args.resume_align_json) as f:
            prev = json.load(f)
        align_history = prev.get("align_history", [])
        resumed_from = (f"{args.init_ckpt} (align_history carried from "
                        f"{args.resume_align_json}; prior run wedged on a "
                        f"relay RPC mid-fine-tune)")
        print(f"carried {len(align_history)} align epochs from "
              f"{args.resume_align_json}", flush=True)

    def dump(complete):
        # incremental artifact: a host reboot mid-run leaves the
        # per-epoch history on disk instead of nothing
        with open(args.out, "w") as f:
            json.dump({
                "complete": complete,
                "align_history": align_history,
                "history": history,
                "baselines": {
                    "mean_predictor_ade": round(baseline, 4),
                    "repeat_wp0": {k: round(v, 4)
                                   for k, v in wp0_all.items()},
                    "repeat_wp0_transfer": {
                        k: round(v, 4) for k, v in wp0_transfer.items()
                    },
                },
                "wall_s": round(time.time() - t0, 1),
            }, f, indent=2)
    in_ft = resume_meta is not None and resume_meta.get("phase") == "ft"
    if args.align_epochs > 0 and not in_ft:
        # ---- stage 1 analogue: dense name->position alignment ----
        from egoscaler_tpu.training.trainer import TrainState, make_optimizer
        import dataclasses as _dc

        loc_train = TrajectoryDataset(
            cfg, samples=synthetic_locate_samples(cfg, args.align_n, seed=1),
            seed=3,
        )
        loc_val = TrajectoryDataset(
            cfg, samples=synthetic_locate_samples(cfg, 64, seed=20_000),
            seed=4,
        )
        a_steps_per_epoch = len(loc_train) // args.bs
        a_total = a_steps_per_epoch * args.align_epochs
        tx_a = make_optimizer(_dc.replace(tcfg, lr=args.align_lr), a_total)
        step_fn_a = make_train_step(model, tx_a, lay.prompt_len, 1)
        state = TrainState(
            state.trainable, state.frozen, tx_a.init(state.trainable),
            jnp.asarray(0, jnp.int32),
        )
        a_start = 0
        if resume_meta is not None and resume_meta.get("phase") == "align":
            from egoscaler_tpu.training.snapshot import load_train_snapshot

            state, _ = load_train_snapshot(snap_path, state)
            a_start = int(resume_meta["epoch"])
            print(f"resumed ALIGN at epoch {a_start}, step "
                  f"{int(state.step)} (schedule intact)", flush=True)
        a_losses = []
        for epoch in range(a_start, args.align_epochs):
            for batch in loc_train.batches(args.bs, shuffle=True):
                batch = {k: jnp.asarray(v) for k, v in batch.items()
                         if k in ("input_ids", "attention_mask",
                                  "point_clouds")}
                state, m = step_fn_a(state, batch)
                a_losses.append(float(m["loss"]))
            rec = {"epoch": epoch,
                   "train_loss": float(np.mean(a_losses[-a_steps_per_epoch:]))}
            if (epoch + 1) % args.eval_every == 0 or (
                    epoch == args.align_epochs - 1):
                s = evaluate(model, state.full_params(), loc_val,
                             batch_size=args.bs, do_sample=False)
                rec.update({f"locate_{k}": float(v) for k, v in s.items()})
            align_history.append(rec)
            print(f"align epoch {epoch}: {rec} ({time.time() - t0:.0f}s)",
                  flush=True)
            dump(complete=False)
            if snap_path:
                from egoscaler_tpu.training.snapshot import (
                    save_train_snapshot,
                )

                save_train_snapshot(
                    snap_path, state,
                    meta={"phase": "align", "epoch": epoch + 1},
                )
        # fresh optimizer + schedule for the trajectory fine-tune (the
        # PLANNED stage transition — distinct from a crash restart)
        state = TrainState(
            state.trainable, state.frozen, tx.init(state.trainable),
            jnp.asarray(0, jnp.int32),
        )
        if snap_path:
            from egoscaler_tpu.training.snapshot import save_train_snapshot

            save_train_snapshot(
                snap_path, state, meta={"phase": "ft", "epoch": 0}
            )

    best = {"ade": float("inf")}
    ft_start = 0
    if in_ft:
        from egoscaler_tpu.training.snapshot import load_train_snapshot

        state, _ = load_train_snapshot(snap_path, state)
        ft_start = int(resume_meta["epoch"])
        if "best_ade" in resume_meta:
            best = {"ade": float(resume_meta["best_ade"])}
        print(f"resumed FT at epoch {ft_start}, step {int(state.step)} "
              f"(optimizer + schedule intact)", flush=True)
    losses = []
    for epoch in range(ft_start, args.epochs):
        for batch in tds.batches(args.bs, shuffle=True):
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k in ("input_ids", "attention_mask", "point_clouds")}
            state, m = step_fn(state, batch)
            losses.append(float(m["loss"]))
        print(f"epoch {epoch}: loss {np.mean(losses[-steps_per_epoch:]):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            s = evaluate(
                model, state.full_params(), vds, batch_size=args.bs,
                do_sample=False,
            )
            xs = evaluate(
                model, state.full_params(), xds, batch_size=args.bs,
                do_sample=False,
            )
            rec = {"epoch": epoch, "step": int(state.step),
                   "train_loss": float(np.mean(losses[-steps_per_epoch:])),
                   **{k: float(v) for k, v in s.items()},
                   **{f"transfer_{k}": float(v) for k, v in xs.items()}}
            history.append(rec)
            print(f"  val: {rec}", flush=True)
            dump(complete=False)
            if rec.get("ade", float("inf")) < best["ade"]:
                best = rec
                if args.save_dir:
                    from flax import traverse_util

                    os.makedirs(args.save_dir, exist_ok=True)
                    flat = traverse_util.flatten_dict(
                        jax.device_get(state.full_params()), sep="/"
                    )
                    tmp = os.path.join(args.save_dir, "best_params.npz.tmp")
                    # float16 on disk: consumers cast to bf16 on load
                    # (bench_quant_decode.py:130), and bf16->f16->bf16
                    # is exact for |x| in [6e-5, 65504] — halves the
                    # committed artifact vs f32
                    with open(tmp, "wb") as f:
                        np.savez(
                            f,
                            **{k: np.asarray(v).astype(np.float16)
                               for k, v in flat.items()},
                        )
                    os.replace(
                        tmp, os.path.join(args.save_dir, "best_params.npz")
                    )
                    print(f"  saved best params (ade {rec['ade']:.4f}) to "
                          f"{args.save_dir}", flush=True)
        if snap_path:
            from egoscaler_tpu.training.snapshot import save_train_snapshot

            meta = {"phase": "ft", "epoch": epoch + 1}
            if np.isfinite(best.get("ade", float("inf"))):
                meta["best_ade"] = round(float(best["ade"]), 6)
            save_train_snapshot(snap_path, state, meta=meta)

    # transfer-margin gate (VERDICT r3 weak #8): the two-stage-grounding
    # headline claims endpoint transfer beats the repeat-wp0 baseline;
    # assert it rather than just recording it so a regressed re-run
    # fails loudly instead of silently replacing the better artifact.
    gate = {
        "best_transfer_ade": round(best.get("transfer_ade", float("inf")), 4),
        "repeat_wp0_transfer_ade": round(wp0_transfer["ade"], 4),
        "pass": best.get("transfer_ade", float("inf")) < wp0_transfer["ade"],
    }
    out = {
        "complete": True,
        "resumed_from": resumed_from,
        "transfer_gate": gate,
        "task": "language-grounded trajectory generation "
                "(verbs + 'move A onto B' transfers -> 6DoF)",
        "model": "tiny" if args.tiny else "flagship_tpu (1.1B)",
        "train_samples": args.train_n,
        "val_samples": args.val_n,
        "transfer_val_samples": len(transfer_s),
        "steps": int(state.step),
        "baselines": {
            "mean_predictor_ade": round(baseline, 4),
            "repeat_wp0": {k: round(v, 4) for k, v in wp0_all.items()},
            "repeat_wp0_transfer": {
                k: round(v, 4) for k, v in wp0_transfer.items()
            },
        },
        "best_val": {k: round(v, 4) for k, v in best.items()},
        "history": history,
        "align_history": align_history,
        "wall_s": round(time.time() - t0, 1),
        "recipe": "unfreeze_pc_encoder=True, unfreeze_lm={} (no "
                  "pretrained weights on this zero-egress host), lr {:g}, "
                  "bs {}, align_epochs {} x {} locate samples (stage-1 "
                  "alignment analogue), locate_mix {:g}".format(
                      args.unfreeze_lm, args.lr, args.bs,
                      args.align_epochs, args.align_n, args.locate_mix),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"baseline": baseline, "best_ade": best.get("ade"),
                      "transfer_gate": gate}))
    assert gate["pass"], (
        f"transfer-margin gate FAILED: best transfer ADE "
        f"{gate['best_transfer_ade']} >= repeat-wp0 baseline "
        f"{gate['repeat_wp0_transfer_ade']} (artifact written anyway)"
    )


if __name__ == "__main__":
    main()
