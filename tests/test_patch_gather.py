"""Pallas correlation-patch gather vs the XLA reference path.

The kernel must reproduce corr_features' per-(frame, track) bilinear
patch + channel dot (dot-before-blend is algebraically identical), incl.
edge clamping near borders, so the tracker can route through it on TPU
without quality drift."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egoscaler_tpu.models.tracker import corr_features


def _both_paths(t=3, q=16, h=24, w=32, c=128, radius=3, levels=2, seed=0):
    rng = np.random.default_rng(seed)
    fmaps = jnp.asarray(rng.normal(size=(t, h, w, c)).astype(np.float32))
    tf = jnp.asarray(rng.normal(size=(q, c)).astype(np.float32))
    coords = jnp.asarray(
        np.stack([
            rng.uniform(-2, w + 2, (t, q)),   # incl. out-of-bounds clamps
            rng.uniform(-2, h + 2, (t, q)),
        ], axis=-1).astype(np.float32)
    )
    os.environ["EGOSCALER_PATCH_GATHER"] = "xla"
    try:
        ref = corr_features(fmaps, tf, coords, radius, levels)
    finally:
        os.environ["EGOSCALER_PATCH_GATHER"] = "pallas"
    try:
        out = corr_features(fmaps, tf, coords, radius, levels)
    finally:
        del os.environ["EGOSCALER_PATCH_GATHER"]
    return np.asarray(ref), np.asarray(out)


def test_pallas_gather_matches_xla_path():
    ref, out = _both_paths()
    assert ref.shape == out.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_pallas_gather_matches_at_scaled_dims():
    # the shipped scaled config's feature dims (C=128) and 3 levels
    ref, out = _both_paths(t=2, q=8, h=32, w=40, c=128, radius=3,
                           levels=3, seed=7)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
