"""Pipeline parallelism (GPipe schedule) over a `pipe` mesh axis.

The reference has NO pipeline parallelism — its only nod is a comment in
pointllm.py:239-240 ("Enable model/pipeline parallelism", which merely
device-casts labels); SURVEY.md §2.4 records PP as absent/optional.
This module goes beyond parity: a TPU-idiomatic GPipe implementation
where

* each pipeline stage lives on one slice of a `pipe` mesh axis and owns
  a contiguous block of decoder layers (leading-axis-stacked params,
  sharded over `pipe` so every device materializes only its own block);
* activations move stage-to-stage with `jax.lax.ppermute` — a
  neighbor-exchange collective that XLA maps onto ICI links;
* the schedule is a `lax.scan` over `num_microbatches + num_stages - 1`
  ticks (the classic GPipe fill/steady/drain timeline) — static control
  flow, one compiled program;
* the whole thing is differentiable: `ppermute` and `scan` have exact
  transposes, so `jax.grad` through `pipeline_apply` yields the 1F1B-
  equivalent backward automatically.

Composes with the existing axes: params may additionally carry `model`
(tensor-parallel) shardings inside each stage; `data` batch sharding
applies outside.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layer_params: Sequence[Any], num_stages: int) -> Any:
    """[L x pytree] -> one pytree with leading dims (num_stages, L/num_stages).

    The per-layer trees must be isomorphic (true for LlamaDecoderLayer).
    The leading `num_stages` dim is the one sharded over the pipe axis.
    """
    n = len(layer_params)
    assert n % num_stages == 0, f"{n} layers not divisible by {num_stages} stages"
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *layer_params
    )
    return jax.tree_util.tree_map(
        lambda a: a.reshape((num_stages, n // num_stages) + a.shape[1:]),
        stacked,
    )


def stage_param_specs(stacked: Any, axis: str = "pipe") -> Any:
    """PartitionSpec pytree sharding the stage dim over `axis`."""
    return jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked
    )


def pipeline_apply(
    layer_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    inputs: jax.Array,
    *extras: jax.Array,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pipe",
    data_axis: str | None = None,
) -> jax.Array:
    """Run a layer stack as a GPipe pipeline over mesh axis `axis`.

    layer_fn(one_layer_params, x, *extras) -> y with y.shape == x.shape.
    stacked_params: from `stack_layer_params` (leading dims
    (num_stages, layers_per_stage)), sharded over `axis`.
    inputs: (batch, ...) activations; batch % num_microbatches == 0.
    extras: per-example side inputs (positions, masks, ...) with the
    same leading batch dim; they are microbatched alongside `inputs`
    and travel stage-to-stage with their activation (stage s works on
    microbatch t-s at tick t, so extras must flow through the ppermute
    chain too).

    Returns (batch, ...) outputs, replicated over `axis` (the last
    stage's results are psum-broadcast so downstream code — lm_head,
    loss — can run without caring which stage it lives on).

    data_axis: optional second mesh axis to shard each MICROBATCH over
    (data parallelism composed with the pipeline: every `data` slice
    runs the same schedule on its shard of the batch; params stay
    replicated over `data`, so gradient psum over `data` outside this
    call gives DDP semantics).  The per-device microbatch size must
    divide by mesh.shape[data_axis].
    """
    num_stages = mesh.shape[axis]
    batch = inputs.shape[0]
    assert batch % num_microbatches == 0, (
        f"batch {batch} % microbatches {num_microbatches} != 0"
    )
    mb = batch // num_microbatches

    def split_mb(a):
        assert a.shape[0] == batch, (
            f"extra with leading dim {a.shape[0]} != batch {batch}"
        )
        return a.reshape((num_microbatches, mb) + a.shape[1:])

    x_mb = split_mb(inputs)
    ex_mb = tuple(split_mb(e) for e in extras)

    fwd_perm = [(i, i + 1) for i in range(num_stages - 1)]

    def shard_body(params, x_all, *ex_all):
        # local params: (1, layers_per_stage, ...) -> (layers_per_stage, ...)
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        stage = jax.lax.axis_index(axis)

        def run_stage(x, ex):
            def layer(x, lp):
                return layer_fn(lp, x, *ex), None

            y, _ = jax.lax.scan(layer, x, params)
            return y

        ticks = num_microbatches + num_stages - 1
        state0 = (
            jnp.zeros_like(x_all[0]),
            tuple(jnp.zeros_like(e[0]) for e in ex_all),
        )
        out0 = jnp.zeros_like(x_all)

        def tick(carry, t):
            (state_x, state_ex), out = carry
            # stage 0 ingests microbatch t while it exists; later stages
            # consume the activation (and its extras) ppermuted in on the
            # previous tick
            mb_t = jnp.clip(t, 0, num_microbatches - 1)

            def ingest(full, carried):
                fresh = jax.lax.dynamic_index_in_dim(
                    full, mb_t, 0, keepdims=False
                )
                return jnp.where(stage == 0, fresh, carried)

            x = ingest(x_all, state_x)
            ex = tuple(ingest(f, c) for f, c in zip(ex_all, state_ex))
            y = run_stage(x, ex)
            # the last stage completes microbatch t - (num_stages - 1)
            o_idx = t - (num_stages - 1)
            written = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(o_idx, 0, num_microbatches - 1), 0
            )
            take = (stage == num_stages - 1) & (o_idx >= 0)
            out = jnp.where(take, written, out)
            # neighbor exchange over ICI; stage 0 receives zeros (unused)
            shift = lambda a: jax.lax.ppermute(a, axis, fwd_perm)
            state = (shift(y), jax.tree_util.tree_map(shift, ex))
            return (state, out), None

        (_, out), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(ticks)
        )
        # broadcast the last stage's buffer to every stage (others hold
        # zeros, so a psum over the axis IS the broadcast)
        mask = (stage == num_stages - 1).astype(out.dtype)
        return jax.lax.psum(out * mask, axis)

    pspec = stage_param_specs(stacked_params, axis)
    # microbatch dim 0 stays whole on every device; the per-microbatch
    # batch dim 1 is optionally sharded over the data axis
    io = P(None, data_axis) if data_axis else P()
    out_mb = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(pspec, io) + tuple(io for _ in extras),
        out_specs=io,
        check_vma=False,
    )(stacked_params, x_mb, *ex_mb)
    return out_mb.reshape((batch,) + out_mb.shape[2:])


def extract_llama_layer_stack(params: Any, num_layers: int) -> list:
    """Pull layers_0..layers_{L-1} subtrees out of a LlamaModel (or
    TrajPointLLM-nested) flax param dict, for `stack_layer_params`."""
    flat = params["params"] if "params" in params else params
    # descend to the dict that owns layers_0 (LlamaModel may be nested)
    def find(tree):
        if isinstance(tree, dict):
            if "layers_0" in tree:
                return tree
            for v in tree.values():
                got = find(v)
                if got is not None:
                    return got
        return None

    owner = find(flat)
    assert owner is not None, "no layers_0 in param tree"
    return [owner[f"layers_{i}"] for i in range(num_layers)]


def llama_pipeline_forward(
    cfg,
    params: Any,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pipe",
    kv_mask: jax.Array | None = None,
    data_axis: str | None = None,
) -> jax.Array:
    """LlamaModel.__call__ equivalent (training forward, no cache) with
    the decoder trunk pipelined over `axis`.  The final RMSNorm runs
    replicated after the pipeline (it is batch-pointwise and tiny).
    ``data_axis`` additionally shards each microbatch over that mesh
    axis (DDP composed with GPipe — see pipeline_apply).
    """
    from egoscaler_tpu.models.llama import LlamaDecoderLayer, RMSNorm

    layer_mod = LlamaDecoderLayer(cfg, 0)

    if kv_mask is None:
        kv_mask = jnp.ones(
            (inputs_embeds.shape[0], inputs_embeds.shape[1]), bool
        )

    def layer_fn(lp, x, pos, mask):
        y, _ = layer_mod.apply(
            {"params": lp}, x, pos, mask, None, None
        )
        return y

    layers = extract_llama_layer_stack(params, cfg.num_hidden_layers)
    stacked = stack_layer_params(layers, mesh.shape[axis])
    stacked = jax.device_put(
        stacked,
        jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), stage_param_specs(stacked, axis)
        ),
    )
    x = pipeline_apply(
        layer_fn, stacked, inputs_embeds, positions, kv_mask,
        mesh=mesh, num_microbatches=num_microbatches, axis=axis,
        data_axis=data_axis,
    )
    flat = params["params"] if "params" in params else params

    def find_norm(tree):
        if isinstance(tree, dict):
            if "norm" in tree and "layers_0" in tree:
                return tree["norm"]
            for v in tree.values():
                got = find_norm(v)
                if got is not None:
                    return got
        return None

    norm = find_norm(flat)
    return RMSNorm(cfg.rms_norm_eps).apply({"params": norm}, x)
