"""Polynomial exact-GELU parity vs the erf definition (ops/gelu.py)."""
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.gelu import erf, gelu


def test_erf_accuracy():
    x = np.linspace(-6, 6, 4001).astype(np.float32)
    got = np.asarray(erf(jnp.asarray(x)))
    import math
    want = np.array([math.erf(v) for v in x], np.float32)
    assert np.max(np.abs(got - want)) < 1e-6  # 1.5e-7 bound + f32 rounding


def test_gelu_matches_exact_nn_gelu():
    rng = np.random.default_rng(0)
    x = rng.normal(scale=3.0, size=(4096,)).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    want = np.asarray(nn.gelu(jnp.asarray(x), approximate=False))
    assert np.max(np.abs(got - want)) < 1e-6


def test_gelu_bf16_roundtrip():
    x = jnp.asarray(np.linspace(-4, 4, 256), jnp.bfloat16)
    out = gelu(x)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
