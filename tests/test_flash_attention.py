"""Flash-attention kernel: forward + fused Pallas backward vs the XLA
reference (CPU interpreter mode; the same kernels run compiled on TPU).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egoscaler_tpu.ops.flash_attention import _xla_reference, flash_attention


def make_qkv(rng, b=2, s=96, t=96, h=2, d=32):
    q = rng.normal(size=(b, s, h, d)).astype(np.float32) * 0.5
    k = rng.normal(size=(b, t, h, d)).astype(np.float32) * 0.5
    v = rng.normal(size=(b, t, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


BLOCKS = dict(block_q=32, block_kv=32)


@pytest.mark.parametrize("causal", [False, True])
def test_forward_parity(rng, causal):
    q, k, v = make_qkv(rng)
    mask = jnp.asarray(rng.random((2, 96)) > 0.2)
    out = flash_attention(q, k, v, causal=causal, kv_mask=mask, **BLOCKS)
    ref = _xla_reference(
        q, k, v, mask.astype(jnp.int32)[:, None, :],
        causal=causal, q_offset=0, scale=float(32 ** -0.5),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_backward_matches_xla_grads(rng, causal):
    q, k, v = make_qkv(rng, s=64, t=64)
    mask = jnp.asarray(rng.random((2, 64)) > 0.15)
    scale = float(32 ** -0.5)

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, causal=causal, kv_mask=mask, use_pallas_bwd=True, **BLOCKS
        )
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    def loss_ref(q, k, v):
        out = _xla_reference(
            q, k, v, mask.astype(jnp.int32)[:, None, :],
            causal=causal, q_offset=0, scale=scale,
        )
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg=f"d{name} mismatch",
        )


def test_backward_with_padding_and_offset(rng):
    # non-block-multiple lengths + KV-cache-style q_offset
    q, k, v = make_qkv(rng, s=40, t=72)
    mask = jnp.asarray(rng.random((2, 72)) > 0.1)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return inner

    flash = loss(
        lambda q, k, v: flash_attention(
            q, k, v, causal=True, q_offset=32, kv_mask=mask,
            use_pallas_bwd=True, **BLOCKS,
        )
    )
    ref = loss(
        lambda q, k, v: _xla_reference(
            q, k, v, mask.astype(jnp.int32)[:, None, :],
            causal=True, q_offset=32, scale=float(32 ** -0.5),
        )
    )
    gf = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


@pytest.mark.parametrize("h", [3, 4])
def test_forward_parity_head_packing(rng, h):
    # h=4 exercises the 4-head-packed program, h=3 the unpacked fallback
    q, k, v = make_qkv(rng, h=h)
    mask = jnp.asarray(rng.random((2, 96)) > 0.2)
    out = flash_attention(q, k, v, kv_mask=mask, **BLOCKS)
    ref = _xla_reference(
        q, k, v, mask.astype(jnp.int32)[:, None, :],
        causal=False, q_offset=0, scale=float(32 ** -0.5),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
