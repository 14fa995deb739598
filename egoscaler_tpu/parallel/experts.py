"""Expert parallelism: a mixture-of-experts FFN sharded over an
`expert` mesh axis.

Beyond parity: the reference has NO expert parallelism (SURVEY.md §2.4
lists EP as absent).  This is the GShard-style dense-dispatch MoE:

* top-1 gating over E experts with a per-expert capacity C (tokens
  over capacity are dropped — their output is the zero vector, exactly
  GShard's overflow semantics);
* dispatch/combine are einsums against a (T, E, C) one-hot tensor —
  MXU-friendly fixed shapes, no ragged all_to_all;
* the expert dimension is sharded over the mesh: each device holds
  E/n experts' weights and computes ONLY its shard of the dispatched
  (E, C, D) tensor; `psum` over the axis reassembles the combined
  output (every token's expert lives on exactly one device, so the
  sum has one non-zero contributor per token).

`moe_ffn` (single-device oracle) and `expert_parallel_ffn` (sharded)
compute identical numbers — asserted in tests/test_expert_parallel.py
and the driver's dryrun_multichip.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

HIGHEST = jax.lax.Precision.HIGHEST


def init_experts(key: jax.Array, num_experts: int, d_model: int,
                 d_ff: int, dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Per-expert SwiGLU-less (gelu) FFN weights, stacked on dim 0."""
    k1, k2, k3 = jax.random.split(key, 3)
    s_in = d_model ** -0.5
    s_ff = d_ff ** -0.5
    return {
        "w_in": (jax.random.normal(k1, (num_experts, d_model, d_ff))
                 * s_in).astype(dtype),
        "w_out": (jax.random.normal(k2, (num_experts, d_ff, d_model))
                  * s_ff).astype(dtype),
        "w_gate": (jax.random.normal(k3, (d_model, num_experts))
                   * s_in).astype(dtype),
    }


def _dispatch_tensors(x: jax.Array, w_gate: jax.Array, capacity: int):
    """Top-1 routing.  Returns (dispatch (T, E, C) one-hot, combine
    (T, E, C) gate-weighted, aux load-balancing loss)."""
    t, _ = x.shape
    e = w_gate.shape[1]
    logits = jnp.einsum("td,de->te", x, w_gate, precision=HIGHEST)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(probs, axis=-1)               # (T,)
    gate = jnp.take_along_axis(probs, expert[:, None], axis=1)[:, 0]
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.int32)   # (T, E)
    # position of each token within its expert's queue (arrival order)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1          # (T, E)
    pos_t = pos.max(axis=1)                                # (T,)
    keep = pos_t < capacity
    slot = jax.nn.one_hot(pos_t, capacity, dtype=x.dtype)  # (T, C)
    dispatch = (onehot.astype(x.dtype)[:, :, None] * slot[:, None, :]
                * keep.astype(x.dtype)[:, None, None])     # (T, E, C)
    combine = dispatch * gate.astype(x.dtype)[:, None, None]
    # GShard aux loss: mean fraction-routed x mean gate prob per expert
    density = onehot.astype(jnp.float32).mean(axis=0)
    density_prob = probs.mean(axis=0)
    aux = (density * density_prob).sum() * e
    return dispatch, combine, aux


def _expert_ffn(w_in, w_out, xs):
    """xs (E_local, C, D) through each expert's FFN."""
    h = jnp.einsum("ecd,edf->ecf", xs, w_in, precision=HIGHEST)
    h = jax.nn.gelu(h)
    return jnp.einsum("ecf,efd->ecd", h, w_out, precision=HIGHEST)


def moe_ffn(params: Dict[str, jax.Array], x: jax.Array,
            capacity: int):
    """Single-device oracle: (T, D) -> (T, D), plus the aux loss."""
    dispatch, combine, aux = _dispatch_tensors(
        x, params["w_gate"], capacity
    )
    xs = jnp.einsum("tec,td->ecd", dispatch, x, precision=HIGHEST)
    ys = _expert_ffn(params["w_in"], params["w_out"], xs)
    y = jnp.einsum("tec,ecd->td", combine, ys, precision=HIGHEST)
    return y, aux


def expert_specs(axis: str = "expert") -> Dict[str, P]:
    """PartitionSpecs for the init_experts tree: expert dim sharded."""
    return {
        "w_in": P(axis, None, None),
        "w_out": P(axis, None, None),
        "w_gate": P(),  # tiny, replicated (every device routes)
    }


def expert_parallel_ffn(
    params: Dict[str, jax.Array],
    x: jax.Array,              # (T, D), replicated
    *,
    mesh: Mesh,
    capacity: int,
    axis: str = "expert",
):
    """`moe_ffn` with experts sharded over ``axis``: each device
    computes its local experts on the dispatched slice; psum combines
    (one non-zero contributor per token)."""
    e = params["w_gate"].shape[1]
    n = mesh.shape[axis]
    assert e % n == 0, f"experts {e} % mesh {n} != 0"

    def body(w_in, w_out, w_gate, x):
        # routing is replicated math (identical on every device)
        dispatch, combine, aux = _dispatch_tensors(x, w_gate, capacity)
        r = jax.lax.axis_index(axis)
        e_local = w_in.shape[0]
        # this device's slice of the (T, E, C) dispatch
        lo = r * e_local
        d_local = jax.lax.dynamic_slice_in_dim(dispatch, lo, e_local, 1)
        c_local = jax.lax.dynamic_slice_in_dim(combine, lo, e_local, 1)
        xs = jnp.einsum("tec,td->ecd", d_local, x, precision=HIGHEST)
        ys = _expert_ffn(w_in, w_out, xs)
        y = jnp.einsum("tec,ecd->td", c_local, ys, precision=HIGHEST)
        return jax.lax.psum(y, axis), aux

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(params["w_in"], params["w_out"], params["w_gate"], x)
