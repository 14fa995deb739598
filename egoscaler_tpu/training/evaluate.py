"""Evaluation harness: batched generation -> detokenize -> metrics.

Rebuild of models/pointllm/evaluate.py:70-189 and the validation loop of
train.py:199-279: generate trajectory tokens with the KV-cache decoder,
decode to 6DoF waypoints, compute ADE/FDE/GD (and IDE/DTW), dump
`{split}_gen_trajs.json`.  Decoding and metrics run on-device with fixed
shapes; only the final scalars come back to host.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egoscaler_tpu.models.pointllm import GenerateConfig, TrajPointLLM, generate
from egoscaler_tpu.training.dataset import BatchLayout, TrajectoryDataset
from egoscaler_tpu.training.metrics import trajectory_metrics


def evaluate(
    model: TrajPointLLM,
    params: Any,
    dataset: TrajectoryDataset,
    batch_size: int = 8,
    key: Optional[jax.Array] = None,
    do_sample: bool = True,
    save_path: Optional[str] = None,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Run generation over the dataset and aggregate trajectory metrics."""
    if key is None:
        key = jax.random.PRNGKey(0)
    lay = BatchLayout(dataset.cfg)
    gen_cfg = GenerateConfig(
        max_new_tokens=lay.answer_len, do_sample=do_sample
    )

    # jit end to end: eager generate re-traces its lax.scan on EVERY
    # call (~seconds of pure-Python tracing per batch at flagship size);
    # shapes are constant across batches so this compiles exactly once.
    gen_fn = jax.jit(
        lambda p, ids_, mask_, pc_, key_: generate(
            model, p, ids_, mask_, pc_, key_, gen_cfg
        )
    )

    all_metrics: Dict[str, list] = {}
    dumped = []
    n_batches = 0
    for raw in dataset.batches(batch_size, shuffle=False, drop_last=True):
        if max_batches is not None and n_batches >= max_batches:
            break
        n_batches += 1
        ids = jnp.asarray(raw["input_ids"])
        mask = jnp.asarray(raw["attention_mask"])
        pc = jnp.asarray(raw["point_clouds"])
        prompt = ids[:, : lay.prompt_len]
        pmask = mask[:, : lay.prompt_len]

        key, sub = jax.random.split(key)
        toks, lengths = gen_fn(params, prompt, pmask, pc, sub)

        # decode: prompt's trailing 8 tokens carry <ts> wp0 <tsep>
        toks_np = np.asarray(toks)
        prompt_np = np.asarray(prompt)
        for b in range(toks_np.shape[0]):
            full = np.concatenate([prompt_np[b, -8:], toks_np[b]])
            gen_traj = dataset.detokenize_traj(full)
            gt = np.asarray(raw["gt_traj"][b])
            if gen_traj is None:
                continue  # reference: skip unparseable (train.py:249-250)
            if gen_traj.shape[0] < gt.shape[0]:
                pad = np.repeat(
                    gen_traj[-1:], gt.shape[0] - gen_traj.shape[0], axis=0
                )
                gen_traj = np.concatenate([gen_traj, pad])
            mets = trajectory_metrics(
                jnp.asarray(gen_traj[: gt.shape[0]]), jnp.asarray(gt)
            )
            for k, v in mets.items():
                all_metrics.setdefault(k, []).append(float(v))
            dumped.append(
                {
                    "image_id": int(raw["image_id"][b]),
                    "gen_traj": gen_traj[: gt.shape[0]].tolist(),
                    "gt_traj": gt.tolist(),
                }
            )

    summary = {
        k: float(np.mean(v)) if v else float("nan")
        for k, v in all_metrics.items()
    }
    summary["num_evaluated"] = float(len(dumped))
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        with open(save_path, "w") as f:
            json.dump({"metrics": summary, "trajs": dumped}, f)
    return summary
