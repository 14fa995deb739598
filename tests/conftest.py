"""Test configuration: run everything on a virtual 8-device CPU mesh.

Set BEFORE jax import so multi-chip sharding tests (pjit over a
jax.sharding.Mesh) execute without TPU hardware — the standard JAX
substitute for fake backends (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (when present) force-overrides jax_platforms via
# jax.config at sitecustomize time; env vars alone don't win.  Re-force CPU
# here — this runs before any backend is instantiated.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
