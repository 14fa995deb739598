"""Ring attention (sequence parallelism) vs the dense oracle.

The reference has no sequence/context parallelism (SURVEY.md §2.4:
absent); this is the TPU-native long-context hook — q/k/v sharded over
a `seq` mesh axis, K/V rotated with ppermute, streaming softmax.
Numerics must match dense attention on the full sequence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from egoscaler_tpu.parallel.sequence import ring_attention


def dense_attn(q, k, v, kv_mask, causal):
    b, s, h, d = q.shape
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST
    ) * d ** -0.5
    valid = kv_mask[:, None, None, :]
    if causal:
        pos = jnp.arange(s)
        # element (q, k): key position <= query position
        valid = valid & (pos[None, :] <= pos[:, None])[None, None]
    logits = jnp.where(valid, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(valid, p, 0.0)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", p, v, precision=jax.lax.Precision.HIGHEST
    )


def make_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), ("seq",))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("ring", [4, 8])
def test_matches_dense(causal, ring):
    mesh = make_mesh(ring)
    b, s, h, d = 2, 8 * ring, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    kv_mask = jnp.ones((b, s), bool)
    want = dense_attn(q, k, v, kv_mask, causal)
    got = ring_attention(
        q, k, v, kv_mask, mesh=mesh, causal=causal
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_padded_keys_are_ignored():
    """Right-padded sequences: masked key positions contribute nothing,
    and queries whose causal window is fully masked output zeros."""
    mesh = make_mesh(4)
    b, s, h, d = 2, 16, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    kv_mask = jnp.ones((b, s), bool).at[:, 10:].set(False)
    want = dense_attn(q, k, v, kv_mask, True)
    got = ring_attention(q, k, v, kv_mask, mesh=mesh, causal=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # a fully-masked batch row outputs zeros, not NaN
    kv_mask0 = jnp.zeros((b, s), bool)
    got0 = ring_attention(q, k, v, kv_mask0, mesh=mesh, causal=False)
    assert np.all(np.isfinite(np.asarray(got0)))
    np.testing.assert_array_equal(np.asarray(got0), 0.0)


def test_differentiable():
    """Gradients flow through the ring (scan + ppermute are
    differentiable); match dense-attention gradients."""
    mesh = make_mesh(4)
    b, s, h, d = 1, 16, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    kv_mask = jnp.ones((b, s), bool)

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, kv_mask, mesh=mesh, causal=True) ** 2
        )

    def loss_dense(q, k, v):
        return jnp.sum(dense_attn(q, k, v, kv_mask, True) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )
