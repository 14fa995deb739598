"""Closed-form tiny-solver parity vs numpy LU (geometry/solve.py)."""
import numpy as np
import jax.numpy as jnp

from egoscaler_tpu.geometry.solve import solve3x3, solve_psd


def test_solve3x3_batched_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(64, 3, 3)).astype(np.float32)
    a = m @ m.transpose(0, 2, 1) + 1e-3 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(solve3x3(jnp.asarray(a), jnp.asarray(b)))
    want = np.linalg.solve(
        a.astype(np.float64), b.astype(np.float64)[..., None]
    )[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_solve3x3_degenerate_rows_finite():
    a = jnp.zeros((2, 3, 3))
    b = jnp.ones((2, 3))
    out = np.asarray(solve3x3(a, b))
    assert np.all(np.isfinite(out))


def test_solve_psd_6x6_matches_numpy():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(6, 6)).astype(np.float32)
    a = m @ m.T + 1e-3 * np.eye(6, dtype=np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    got = np.asarray(solve_psd(jnp.asarray(a), jnp.asarray(b)))
    want = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
