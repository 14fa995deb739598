"""Benchmark: flagship train-step throughput on the available chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: trajectory-training samples/sec on the flagship model (full
PointBERT 8192-pt encoder + 1.1B LLaMA trunk, bf16, frozen-backbone
regime exactly like the reference training recipe).

vs_baseline: ratio against the reference configuration's estimated
throughput.  The reference publishes no numbers (BASELINE.md); its
training config is PointLLM-7B, bs 8/GPU, bf16, frozen LLM+PointBERT
(train.py:91-104,337-341).  We estimate the reference per-GPU rate from
an A100-80GB roofline on the same token budget: fwd-only FLOPs for
frozen layers + fwd+bwd for trainable embeddings at 40% MFU ->
~3.4 samples/sec/GPU.  Scaled by model-size ratio (7B/1.1B ~= 6.2x
parameters) the comparable per-chip reference rate is ~21 samples/sec;
vs_baseline = measured / 21.  This estimate is replaced by a measured
baseline once the reference harness is runnable on matched hardware.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
    from egoscaler_tpu.models.pointllm import TrajPointLLM
    from egoscaler_tpu.training.dataset import (
        BatchLayout,
        TrajectoryDataset,
        synthetic_samples,
    )
    from egoscaler_tpu.training.trainer import (
        create_train_state,
        make_train_step,
    )

    batch_size = 8  # reference: bs 8/GPU (train.py:338)
    cfg = PointLLMConfig().flagship_tpu()
    tcfg = TrainConfig(batch_size=batch_size)
    model = TrajPointLLM(cfg, remat=True)

    ds = TrajectoryDataset(cfg, samples=synthetic_samples(cfg, batch_size), seed=0)
    raw = next(ds.batches(batch_size, shuffle=False))
    batch = {
        "input_ids": jnp.asarray(raw["input_ids"]),
        "attention_mask": jnp.asarray(raw["attention_mask"]),
        "point_clouds": jnp.asarray(raw["point_clouds"]),
    }
    lay = BatchLayout(cfg)

    state, tx = create_train_state(
        model, tcfg, jax.random.PRNGKey(0), batch, total_steps=1000
    )
    # bf16 params for MXU throughput (reference trains bf16, train.py:98)
    state = type(state)(
        jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, state.trainable
        ),
        jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, state.frozen
        ),
        state.opt_state,
        state.step,
    )
    step = make_train_step(model, tx, lay.prompt_len, donate=False)

    # warmup/compile
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * iters / dt
    baseline_est = 21.0  # see module docstring
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 3),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / baseline_est, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
