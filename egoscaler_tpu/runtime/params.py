"""On-device parameter materialization.

Large param trees (7B = 12.6 GiB bf16) cannot take the usual
host-f32-init -> device_put -> cast route: the f32 copy alone is
25 GiB.  ``leafwise_bf16_params`` emits every leaf directly in bf16
inside ONE jitted program, so peak device memory is the final tree
size.  Weights are random — on a zero-egress host compute cost is
architecture/shape dependent, not weight dependent (the checkpoint
path is models/convert.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def leafwise_bf16_params(model, *example_args, scale: float = 0.02):
    """Materialize ``model.init(key, *example_args)``'s tree in bf16
    directly on device: one jitted program emitting every leaf (peak =
    final tree size, no f32 copy)."""
    shapes = jax.eval_shape(
        lambda r: model.init(r, *example_args), jax.random.PRNGKey(0)
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make(key):
        outs = []
        for i, s in enumerate(leaves):
            if jnp.issubdtype(s.dtype, jnp.floating):
                kk = jax.random.fold_in(key, i)
                outs.append(
                    scale * jax.random.normal(kk, s.shape, jnp.bfloat16)
                )
            elif s.dtype == jnp.int8:
                # quantized decode weights (models/quantize.py): random
                # int8 so timing runs see realistic, incompressible data
                kk = jax.random.fold_in(key, i)
                outs.append(
                    jax.random.randint(kk, s.shape, -127, 128, jnp.int32)
                    .astype(jnp.int8)
                )
            else:
                outs.append(jnp.zeros(s.shape, s.dtype))
        return outs

    out_leaves = jax.block_until_ready(make(jax.random.PRNGKey(1)))
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
