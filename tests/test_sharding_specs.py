"""ZeRO-1 partition-spec rules: optimizer moments sharded over `data`."""
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from egoscaler_tpu.parallel.sharding import (
    opt_state_specs,
    optimizer_specs,
    param_specs,
    spec_uses_axis,
)


def flat_params():
    return {
        "params/model/layers_0/attn/q_proj/kernel": jnp.zeros((8, 8)),
        "params/model/layers_0/mlp/down_proj/kernel": jnp.zeros((16, 8)),
        "params/embed_tokens/embedding": jnp.zeros((32, 8)),
        "params/point_proj/proj_0/kernel": jnp.zeros((4, 8)),
        "params/model/norm/scale": jnp.zeros((8,)),
    }


def test_optimizer_specs_add_data_axis():
    params = flat_params()
    ospecs = optimizer_specs(params)
    pspecs = param_specs(params)
    for k in params:
        assert spec_uses_axis(ospecs[k], "data"), k
        # TP sharding from the param spec is preserved
        for axis in ("model",):
            assert spec_uses_axis(ospecs[k], axis) == spec_uses_axis(
                pspecs[k], axis
            ), k


def test_opt_state_specs_cover_adam_moments():
    params = flat_params()
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(1e-3)
    )
    opt_state = tx.init(params)
    specs = opt_state_specs(opt_state, params)
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    state_leaves = jax.tree_util.tree_leaves(opt_state)
    assert len(spec_leaves) == len(state_leaves)
    n_data = sum(spec_uses_axis(s, "data") for s in spec_leaves)
    # mu + nu for every param
    assert n_data == 2 * len(params)
    # scalar counters replicated
    for leaf, spec in zip(state_leaves, spec_leaves):
        if getattr(leaf, "ndim", 0) == 0:
            assert spec == P()
