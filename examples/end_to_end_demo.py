"""End-to-end demo: train -> generate -> render a trajectory video.

Trains the tiny TrajPointLLM on the learnable synthetic task (~10 s on
one TPU chip), generates a 6DoF trajectory for a held-out sample, and
renders the vis/video.py-style orbit MP4 of the point cloud + OBB path.

    python examples/end_to_end_demo.py --out demo.mp4
"""
import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
from egoscaler_tpu.models.pointllm import GenerateConfig, TrajPointLLM, generate
from egoscaler_tpu.training.dataset import (
    BatchLayout,
    TrajectoryDataset,
    learnable_synthetic_samples,
)
from egoscaler_tpu.training.evaluate import evaluate
from egoscaler_tpu.training.train_loop import device_prefetch
from egoscaler_tpu.training.trainer import create_train_state, make_train_step
from egoscaler_tpu.vis.render import render_trajectory_frames, write_video


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="demo_trajectory.mp4")
    p.add_argument("--epochs", type=int, default=75)
    args = p.parse_args()

    cfg = PointLLMConfig().tiny()
    tcfg = TrainConfig(batch_size=16, lr=2e-3)
    model = TrajPointLLM(cfg, remat=False)
    train_ds = TrajectoryDataset(
        cfg, samples=learnable_synthetic_samples(cfg, 128), seed=0
    )
    val_ds = TrajectoryDataset(
        cfg, samples=learnable_synthetic_samples(cfg, 8, seed=99), seed=9
    )
    lay = BatchLayout(cfg)

    raw = next(train_ds.batches(16, shuffle=False))
    b0 = {k: jnp.asarray(raw[k]) for k in
          ("input_ids", "attention_mask", "point_clouds")}
    state, tx = create_train_state(
        model, tcfg, jax.random.PRNGKey(0), b0, total_steps=600
    )
    step = make_train_step(model, tx, lay.prompt_len, donate=False)

    print("training...")
    for epoch in range(args.epochs):
        for batch in device_prefetch(train_ds.batches(16, shuffle=True)):
            state, m = step(state, batch)
    print(f"final loss {float(m['loss']):.3f}")

    summary = evaluate(
        model, state.full_params(), val_ds, batch_size=8,
        do_sample=False, max_batches=1,
    )
    print("val metrics:", {k: round(v, 3) for k, v in summary.items()})

    # generate for one held-out sample and render
    sample = val_ds.samples[0]
    raw = next(val_ds.batches(1, shuffle=False))
    prompt = jnp.asarray(raw["input_ids"][:, : lay.prompt_len])
    pmask = jnp.asarray(raw["attention_mask"][:, : lay.prompt_len])
    pc = jnp.asarray(raw["point_clouds"])
    toks, lengths = generate(
        model, state.full_params(), prompt, pmask, pc,
        jax.random.PRNGKey(0),
        GenerateConfig(max_new_tokens=lay.answer_len, do_sample=False),
    )
    full = np.concatenate(
        [np.asarray(prompt[0, -8:]), np.asarray(toks[0])]
    )
    traj = val_ds.detokenize_traj(full)
    print(f"generated {len(traj)} waypoints for: {sample.description!r}")

    bbox = np.random.default_rng(0).uniform(-0.04, 0.04, (8, 3)).astype(np.float32)
    quat = np.zeros((len(traj), 4), np.float32)
    quat[:, 3] = 1.0
    traj_pkl = {
        "init_bbox": bbox,
        "traj_quat": np.concatenate([traj[:, :3], quat], axis=1),
        "traj_rotvec": traj,
    }
    pts = sample.pcrgb[:, :3]
    cols = sample.pcrgb[:, 3:6]
    frames = render_trajectory_frames(pts, cols, traj_pkl, size=480)
    write_video(frames, args.out)
    print("wrote", args.out, os.path.getsize(args.out), "bytes")

    from egoscaler_tpu.vis.interactive import export_interactive_html

    html = os.path.splitext(args.out)[0] + ".html"
    export_interactive_html(
        pts, cols, traj_pkl, html,
        narration="generated trajectory (tiny demo model)",
    )
    print("wrote", html, os.path.getsize(html), "bytes (open in a browser)")


if __name__ == "__main__":
    main()
