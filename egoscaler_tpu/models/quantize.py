"""Trained-params -> int8 decode-serving params.

`quantize_decode_params` rewrites a TrajPointLLM param tree so it loads
into the same model built with `cfg.llama.weight_quant="int8"`: every
LLaMA projection kernel (q/k/v/o_proj, gate/up/down_proj) and the
lm_head kernel become {kernel_q: int8, scale: f32 per-output-channel}
(ops/quant_matmul.quantize_weight).  Everything else — embeddings,
norms, the PointBERT encoder and projector (run once per sequence, not
per decode step) — keeps its dtype.

The reference serves fp16 through HF generate (model_arch.py:77-108)
and has no quantized path; this is the TPU-native serving extension
that ~halves the per-step parameter streaming that bounds decode.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import traverse_util

from egoscaler_tpu.ops.quant_matmul import quantize_weight

_QUANT_LEAVES = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)


def quantize_decode_params(
    variables: Dict[str, Any], trunk_only: bool = False
) -> Dict[str, Any]:
    """Rewrite {**, <proj>/kernel} -> {**, <proj>/{kernel_q, scale}};
    remaining f32 float leaves are cast to bf16 (the serving dtype —
    scales stay f32 via the quantizer).  ``trunk_only`` skips lm_head —
    the frozen-trunk training recipe (run_7b_chip.py --quant_trunk)
    keeps lm_head a trainable bf16 Dense."""
    flat = traverse_util.flatten_dict(variables)
    out = {}
    n_quant = 0
    quant_leaves = (
        tuple(n for n in _QUANT_LEAVES if n != "lm_head")
        if trunk_only else _QUANT_LEAVES
    )
    for path, leaf in flat.items():
        leaf = jnp.asarray(leaf)
        if (
            len(path) >= 2
            and path[-1] == "kernel"
            and path[-2] in quant_leaves
        ):
            q, s = quantize_weight(leaf)
            out[path[:-1] + ("kernel_q",)] = q
            out[path[:-1] + ("scale",)] = s
            n_quant += 1
        else:
            if leaf.dtype == jnp.float32:
                leaf = leaf.astype(jnp.bfloat16)
            out[path] = leaf
    assert n_quant > 0, "no projection kernels found to quantize"
    return traverse_util.unflatten_dict(out)


def quantized_param_bytes(variables: Dict[str, Any]) -> int:
    """Total serialized bytes of a (possibly quantized) param tree."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(variables)
    )
