"""Expert-parallel MoE FFN vs its single-device oracle.

The reference has no expert parallelism (SURVEY.md §2.4: absent);
parallel/experts.py is the TPU-native GShard-style dense-dispatch MoE
with the expert dim sharded over an `expert` mesh axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from egoscaler_tpu.parallel.experts import (
    expert_parallel_ffn,
    init_experts,
    moe_ffn,
)


def make_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), ("expert",))


@pytest.mark.parametrize("n_shards", [4, 8])
def test_matches_oracle(n_shards):
    mesh = make_mesh(n_shards)
    t, d, f, e, cap = 64, 16, 32, 8, 16
    params = init_experts(jax.random.PRNGKey(0), e, d, f)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d))
    y_ref, aux_ref = moe_ffn(params, x, capacity=cap)
    y, aux = expert_parallel_ffn(params, x, mesh=mesh, capacity=cap)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)


def test_capacity_overflow_drops_tokens():
    """Tokens over an expert's capacity get the zero vector (GShard
    overflow semantics), and in-capacity tokens are unaffected."""
    t, d, f, e = 32, 8, 16, 4
    params = init_experts(jax.random.PRNGKey(2), e, d, f)
    x = jax.random.normal(jax.random.PRNGKey(3), (t, d))
    y_small, _ = moe_ffn(params, x, capacity=1)
    y_big, _ = moe_ffn(params, x, capacity=t)
    # with capacity >= T nothing is dropped; all tokens produce output
    assert np.all(np.abs(np.asarray(y_big)).sum(axis=1) > 0)
    # with capacity 1, at most e tokens survive, the rest are zeros
    nz = np.abs(np.asarray(y_small)).sum(axis=1) > 0
    assert nz.sum() <= e
    # survivors compute the same value as in the uncropped run
    np.testing.assert_allclose(
        np.asarray(y_small)[nz], np.asarray(y_big)[nz],
        rtol=1e-5, atol=1e-6,
    )


def test_differentiable_and_load_balance_grad():
    """Gradients flow through dispatch/combine and the aux loss on the
    sharded path, matching the oracle."""
    mesh = make_mesh(4)
    t, d, f, e, cap = 32, 8, 16, 4, 16
    params = init_experts(jax.random.PRNGKey(4), e, d, f)
    x = jax.random.normal(jax.random.PRNGKey(5), (t, d))

    def loss_ref(p):
        y, aux = moe_ffn(p, x, capacity=cap)
        return jnp.sum(y ** 2) + 0.01 * aux

    def loss_ep(p):
        y, aux = expert_parallel_ffn(p, x, mesh=mesh, capacity=cap)
        return jnp.sum(y ** 2) + 0.01 * aux

    gr = jax.grad(loss_ref)(params)
    ge = jax.grad(loss_ep)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(ge[k]), np.asarray(gr[k]),
            rtol=2e-4, atol=1e-5, err_msg=k,
        )
