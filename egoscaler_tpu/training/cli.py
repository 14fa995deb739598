"""Train / evaluate CLI entry points (the reference's train.py /
evaluate.py argparse surface, models/pointllm/train.py:312-348,
evaluate.py:171-189)."""
from __future__ import annotations

import argparse
import dataclasses
import os


def build_configs(args):
    from egoscaler_tpu.configs import (
        MeshConfig,
        PointLLMConfig,
        TrainConfig,
    )

    cfg = PointLLMConfig()
    if args.model_size == "tiny":
        cfg = cfg.tiny()
    elif args.model_size == "flagship":
        cfg = cfg.flagship_tpu()
    tcfg = TrainConfig(
        batch_size=args.bs,
        grad_accum_steps=args.grad_accum_steps,
        epochs=args.epochs,
        lr=args.lr_llm,
        do_norm=args.do_norm,
        do_standard=args.do_standard,
        smooth_traj=args.smooth_traj,
        unfreeze_pc_encoder=args.unfreeze_pc_encoder,
        unfreeze_language_model=args.unfreeze_language_model,
        mesh=MeshConfig(data=args.mesh_data, model=args.mesh_model),
    )
    return cfg, tcfg


def make_parser():
    p = argparse.ArgumentParser(description="EgoScaler-TPU trainer")
    p.add_argument("--root_dir", required=True)
    p.add_argument("--run_dir", default="runs/default")
    p.add_argument("--task", default="desc2traj")
    p.add_argument("--model_size", default="flagship",
                   choices=["tiny", "flagship", "full"])
    p.add_argument("--max_traj_token", type=int, default=160)
    p.add_argument("--max_desc_token", type=int, default=20)
    p.add_argument("--num_steps", type=int, default=20)
    p.add_argument("--num_bins", type=int, default=256)
    p.add_argument("--do_norm", action="store_true", default=True)
    p.add_argument("--do_standard", action="store_true")
    p.add_argument("--smooth_traj", action="store_true")
    p.add_argument("--unfreeze_pc_encoder", action="store_true")
    p.add_argument("--unfreeze_language_model", action="store_true")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--grad_accum_steps", type=int, default=1)
    p.add_argument("--lr_llm", type=float, default=2e-5)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--eval_batches", type=int, default=None)
    p.add_argument("--pretrained", default=None,
                   help="torch PointLLM checkpoint to convert + load")
    return p


def main_train(argv=None):
    args = make_parser().parse_args(argv)
    from egoscaler_tpu.training.dataset import TrajectoryDataset
    from egoscaler_tpu.training.train_loop import train

    cfg, tcfg = build_configs(args)
    train_ds = TrajectoryDataset(
        cfg, root_dir=args.root_dir, split="train",
        do_norm=tcfg.do_norm, do_standard=tcfg.do_standard,
        smooth=tcfg.smooth_traj,
    )
    val_ds = TrajectoryDataset(
        cfg, root_dir=args.root_dir, split="val",
        do_norm=tcfg.do_norm, do_standard=tcfg.do_standard,
        smooth=tcfg.smooth_traj,
    )
    train(cfg, tcfg, train_ds, val_ds, run_dir=args.run_dir,
          resume=args.resume, eval_batches=args.eval_batches)


def main_evaluate(argv=None):
    p = make_parser()
    p.add_argument("--split", default="test")
    p.add_argument("--checkpoint_dir", default=None)
    args = p.parse_args(argv)
    import jax

    from egoscaler_tpu.models.pointllm import TrajPointLLM
    from egoscaler_tpu.training.checkpoint import CheckpointManager
    from egoscaler_tpu.training.dataset import TrajectoryDataset
    from egoscaler_tpu.training.evaluate import evaluate
    from egoscaler_tpu.training.trainer import create_train_state

    cfg, tcfg = build_configs(args)
    ds = TrajectoryDataset(cfg, root_dir=args.root_dir, split=args.split)
    model = TrajPointLLM(cfg, remat=False)
    sample = next(ds.batches(args.bs, shuffle=False))
    import jax.numpy as jnp

    batch = {k: jnp.asarray(v) for k, v in sample.items()
             if k in ("input_ids", "attention_mask", "point_clouds")}
    state, _ = create_train_state(
        model, tcfg, jax.random.PRNGKey(0), batch, 1
    )
    ckpt_dir = args.checkpoint_dir or os.path.join(
        args.run_dir, tcfg.checkpoint_dir
    )
    mngr = CheckpointManager(ckpt_dir)
    best = mngr.restore_best(state)
    if best is not None:
        state = best
        print("loaded best-ADE checkpoint")
    summary = evaluate(
        model, state.full_params(), ds, batch_size=args.bs,
        save_path=os.path.join(args.run_dir, f"{args.split}_gen_trajs.json"),
    )
    print(summary)


def main():
    """`python -m egoscaler_tpu.training.cli {train,evaluate} ...` —
    the reference's train.py / evaluate.py pair behind one dispatcher."""
    import sys

    argv = sys.argv[1:]
    cmd = argv[0] if argv and not argv[0].startswith("-") else "train"
    rest = argv[1:] if argv and not argv[0].startswith("-") else argv
    if cmd == "train":
        main_train(rest)
    elif cmd == "evaluate":
        main_evaluate(rest)
    else:
        raise SystemExit(f"unknown command {cmd!r}; use train or evaluate")


if __name__ == "__main__":
    main()
