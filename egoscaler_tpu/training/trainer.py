"""Jitted training harness: one XLA program per step, pjit-sharded.

Rebuild of the reference DeepSpeed harness (models/pointllm/train.py):

* AdamW + linear warmup-decay schedule (train.py:106-117);
* CE loss on the answer suffix only — logits[:, P-1:-1] vs tokens[:, P:],
  ignoring pads (train.py:174-181), with the prompt length STATIC from
  the dataset layout so the slice compiles;
* selective training (model_arch.py:33-51): the point backbone and LLaMA
  layers are FROZEN by default — we split the param tree and only
  differentiate the trainable subtree (no wasted grad memory, the
  TPU-native analogue of requires_grad=False);
* gradient accumulation via lax.scan over micro-batches (train.py:93-95);
* ZeRO-1 analogue: optimizer state sharded over the `data` mesh axis,
  params replicated over `data` and TP-sharded over `model`
  (parallel/sharding.py).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
from egoscaler_tpu.models.pointllm import TrajPointLLM
from egoscaler_tpu.training.dataset import PAD_ID, BatchLayout

# param-path regexes that stay FROZEN by default (model_arch.py:37-46)
FROZEN_PATTERNS_DEFAULT = (
    r"^params/point_backbone/.*",
    r"^params/model/layers_\d+/.*",
)


def frozen_patterns(cfg: TrainConfig) -> Tuple[str, ...]:
    pats = []
    if not cfg.unfreeze_pc_encoder:
        pats.append(r"^params/point_backbone/.*")
    if not cfg.unfreeze_language_model:
        pats.append(r"^params/model/layers_\d+/.*")
    return tuple(pats)


def partition_params(params: Any, patterns: Tuple[str, ...]):
    """Split a flax variable dict into (trainable, frozen) flat dicts."""
    flat = traverse_util.flatten_dict(params, sep="/")
    frozen, trainable = {}, {}
    regs = [re.compile(p) for p in patterns]
    for k, v in flat.items():
        # non-param collections (batch_stats, ...) are never optimized
        if not k.startswith("params/") or any(r.match(k) for r in regs):
            frozen[k] = v
        else:
            trainable[k] = v
    return trainable, frozen


def merge_params(trainable: Dict, frozen: Dict) -> Any:
    flat = dict(frozen)
    flat.update(trainable)
    return traverse_util.unflatten_dict(flat, sep="/")


def make_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    """Linear warmup (1/5 of training) then linear decay to 0
    (train.py:114-117 get_linear_schedule_with_warmup)."""
    warmup = max(int(total_steps * cfg.warmup_fraction), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.lr, warmup),
            optax.linear_schedule(cfg.lr, 0.0, max(total_steps - warmup, 1)),
        ],
        [warmup],
    )


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            make_schedule(cfg, total_steps),
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )


@struct.dataclass
class TrainState:
    trainable: Dict[str, jax.Array]
    frozen: Dict[str, jax.Array]
    opt_state: Any
    step: jax.Array

    def full_params(self):
        return merge_params(self.trainable, self.frozen)


def create_train_state(
    model: TrajPointLLM,
    cfg: TrainConfig,
    rng: jax.Array,
    sample_batch: Dict[str, jax.Array],
    total_steps: int,
) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = model.init(
        rng,
        jnp.asarray(sample_batch["input_ids"]),
        jnp.asarray(sample_batch["point_clouds"]),
    )
    trainable, frozen = partition_params(variables, frozen_patterns(cfg))
    tx = make_optimizer(cfg, total_steps)
    opt_state = tx.init(trainable)
    return (
        TrainState(trainable, frozen, opt_state, jnp.asarray(0, jnp.int32)),
        tx,
    )


def suffix_ce_loss(
    logits: jax.Array, tokens: jax.Array, prompt_len: int
) -> jax.Array:
    """train.py:174-181: CE over answer tokens, pads ignored."""
    pred = logits[:, prompt_len - 1 : -1]  # predicts tokens[prompt_len:]
    tgt = tokens[:, prompt_len:]
    valid = tgt != PAD_ID
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def make_train_step(
    model: TrajPointLLM,
    tx: optax.GradientTransformation,
    prompt_len: int,
    grad_accum_steps: int = 1,
    donate: bool = True,
    jit: bool = True,
) -> Callable:
    """Build the jitted train step.

    Batch dict: input_ids (B, T), attention_mask (B, T),
    point_clouds (B, N, 6).  With grad_accum_steps > 1, B must be
    divisible and micro-batches run under lax.scan.
    """

    def loss_fn(trainable, frozen, micro):
        params = merge_params(trainable, frozen)
        logits = model.apply(
            params,
            micro["input_ids"],
            micro["point_clouds"],
            micro["attention_mask"],
            train=False,  # frozen backbones stay in eval (model_arch.py:110-123)
        )
        return suffix_ce_loss(logits, micro["input_ids"], prompt_len)

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        if grad_accum_steps == 1:
            loss, grads = grad_fn(state.trainable, state.frozen, batch)
        else:
            def micro_step(acc, micro):
                loss_acc, grads_acc = acc
                l, g = grad_fn(state.trainable, state.frozen, micro)
                return (
                    loss_acc + l,
                    jax.tree_util.tree_map(jnp.add, grads_acc, g),
                ), None

            micro_batches = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (grad_accum_steps, x.shape[0] // grad_accum_steps)
                    + x.shape[1:]
                ),
                batch,
            )
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.trainable)
            (loss, grads), _ = jax.lax.scan(
                micro_step, (jnp.asarray(0.0), zero), micro_batches
            )
            loss = loss / grad_accum_steps
            grads = jax.tree_util.tree_map(
                lambda g: g / grad_accum_steps, grads
            )

        updates, opt_state = tx.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(trainable, state.frozen, opt_state, state.step + 1),
            {"loss": loss},
        )

    if not jit:
        # raw callable for AOT paths that pick their own jit options
        # (AUTO input layouts at 7B — scripts/run_7b_chip.py)
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
