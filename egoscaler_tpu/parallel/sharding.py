"""Parameter / optimizer partition rules (Megatron-style TP + ZeRO DP).

The reference ships DeepSpeed ZeRO-1 (train.py:91-104) and a degenerate
tp_size=1 tensor-parallel path (evaluate.py:84-88); the LLaMA-70B
annotation stages use fairscale model parallelism (SURVEY.md §2.4).
Here, one rule table covers all of it:

* `model` axis shards attention heads and MLP intermediate dims
  (column-parallel q/k/v/gate/up, row-parallel o/down) and the
  vocabulary dim of embed/lm_head;
* everything else is replicated across `model`;
* optimizer state is additionally sharded over `data` (ZeRO-1) by
  applying `zero_sharding` to the optax state tree.

Rules are path-regex -> PartitionSpec, applied to a flax param pytree.
"""
from __future__ import annotations

import re
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'a/b/c' param path, spec) — first match wins.
LLAMA_RULES: Tuple[Tuple[str, P], ...] = (
    # column-parallel: output dim sharded over model axis
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*(gate_proj|up_proj)/kernel$", P(None, "model")),
    # row-parallel: input dim sharded
    (r".*(o_proj|down_proj)/kernel$", P("model", None)),
    # extended vocab embedding / head: shard vocab dim
    (r".*embed_tokens/embedding$", P("model", None)),
    (r".*lm_head/kernel$", P(None, "model")),
    # int8 decode weights (models/quantize.py): kernel_q shards exactly
    # like kernel; per-OUTPUT-channel scales follow the output dim —
    # sharded for column-parallel, replicated for row-parallel (the
    # proj names keep these rules off LayerNorm 'scale' params)
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj|lm_head)/kernel_q$",
     P(None, "model")),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj|lm_head)/scale$",
     P("model")),
    (r".*(o_proj|down_proj)/kernel_q$", P("model", None)),
    (r".*(o_proj|down_proj)/scale$", P()),
    # point backbone + projector: small, replicated
    (r".*", P()),
)


def spec_for_path(path: str, rules=LLAMA_RULES) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_specs(params: Any, rules=LLAMA_RULES) -> Any:
    """Pytree of PartitionSpec matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), rules), params
    )


def param_shardings(mesh: Mesh, params: Any, rules=LLAMA_RULES) -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params, rules),
        is_leaf=lambda x: isinstance(x, P),
    )


def zero_spec_for_param(spec: P, shape: Tuple[int, ...]) -> P:
    """ZeRO-1: additionally shard optimizer-state leaves over `data` on
    the largest unsharded dim (if divisible at runtime XLA handles the
    uneven case by replication fallback — we only annotate clean dims)."""
    dims = list(spec) + [None] * (len(shape) - len(spec))
    for i, d in enumerate(dims):
        if d is None:
            dims[i] = "data"
            return P(*dims)
    return spec


def optimizer_specs(params: Any, rules=LLAMA_RULES) -> Any:
    """Specs for optimizer moment tensors (same shape as params) with the
    extra `data` axis sharding (ZeRO-1 analogue)."""
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda spec, p: zero_spec_for_param(spec, p.shape),
        specs,
        params,
        is_leaf=lambda x: isinstance(x, P),
    )


def opt_state_specs(opt_state: Any, params: Any, rules=LLAMA_RULES) -> Any:
    """PartitionSpec pytree matching an optax state whose moment subtrees
    (mu/nu, ...) mirror a *flat* param dict (path-string keys, as produced
    by trainer.partition_params).

    Moment leaves get `optimizer_specs` (param TP spec + ZeRO-1 `data`
    sharding on the first free dim — train.py:91-104's zero stage 1);
    counters and other scalar state are replicated.
    """
    flat_specs = dict(optimizer_specs(params, rules))

    def leaf_spec(path, leaf):
        if getattr(leaf, "ndim", 0) == 0:
            return P()
        for entry in path:
            key = getattr(entry, "key", None)
            if key in flat_specs and flat_specs[key] is not None:
                return flat_specs[key]
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, opt_state)


def opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any,
                        rules=LLAMA_RULES) -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        opt_state_specs(opt_state, params, rules),
        is_leaf=lambda x: isinstance(x, P),
    )


def spec_uses_axis(spec: P, axis: str) -> bool:
    """True if a PartitionSpec shards any dim over `axis`."""
    for d in spec:
        if d == axis or (isinstance(d, (tuple, list)) and axis in d):
            return True
    return False
