"""Orbax CheckpointManager tests: round-trip, best-ADE semantics,
resume counters, and cross-mesh restore.

Mirrors the reference resume semantics (models/pointllm/train.py:127-150
restores model+optimizer+scheduler+epoch+global_step; :287-308 keeps
latest + best-ADE files).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egoscaler_tpu.training.checkpoint import CheckpointManager
from egoscaler_tpu.training.trainer import TrainState


def make_state(scale=1.0, step=5):
    params = {
        "w": jnp.arange(64, dtype=jnp.float32).reshape(8, 8) * scale,
        "b": jnp.full((8,), 2.0 * scale, jnp.float32),
    }
    frozen = {"f": jnp.full((4,), 7.0 * scale, jnp.float32)}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    return TrainState(params, frozen, opt_state, jnp.asarray(step, jnp.int32))


def zeros_like_state(state):
    return jax.tree.map(jnp.zeros_like, state)


def assert_state_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a,
        b,
    )


def test_latest_roundtrip_bit_exact(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    state = make_state(scale=1.5, step=17)
    mngr.save_latest(17, state)
    mngr.wait()

    restored, step = CheckpointManager(str(tmp_path / "ckpt")).restore_latest(
        zeros_like_state(state)
    )
    assert step == 17
    assert int(restored.step) == 17
    assert_state_equal(restored, state)


def test_restore_latest_empty_dir(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    restored, step = mngr.restore_latest(zeros_like_state(make_state()))
    assert restored is None and step == 0


def test_best_ade_only_improves(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    good = make_state(scale=1.0, step=10)
    worse = make_state(scale=9.0, step=20)

    assert mngr.save_best(10, good, ade=0.5)
    mngr.wait()
    assert not mngr.save_best(20, worse, ade=0.9)  # regression: no save
    mngr.wait()

    restored = mngr.restore_best(zeros_like_state(good))
    assert int(restored.step) == 10
    assert_state_equal(restored, good)


def test_best_ade_persists_across_managers(tmp_path):
    """A resumed run (fresh manager instance) must not clobber the best
    checkpoint with a worse ADE."""
    first = CheckpointManager(str(tmp_path / "ckpt"))
    best = make_state(scale=1.0, step=10)
    assert first.save_best(10, best, ade=0.25)
    first.wait()

    resumed = CheckpointManager(str(tmp_path / "ckpt"))
    assert resumed.best_ade == pytest.approx(0.25)
    assert not resumed.save_best(30, make_state(scale=3.0, step=30), ade=0.4)
    assert resumed.save_best(40, make_state(scale=4.0, step=40), ade=0.1)
    resumed.wait()

    restored = resumed.restore_best(zeros_like_state(best))
    assert int(restored.step) == 40


def _sharded_state(mesh, spec_2d):
    w = jax.device_put(
        jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
        NamedSharding(mesh, spec_2d),
    )
    b = jax.device_put(
        jnp.arange(8, dtype=jnp.float32), NamedSharding(mesh, P("data"))
    )
    params = {"w": w, "b": b}
    opt_state = optax.adamw(1e-3).init(params)
    return TrainState(params, {}, opt_state, jnp.asarray(3, jnp.int32))


def test_cross_mesh_restore(tmp_path):
    """Save sharded over a (4,2) mesh, restore onto a (2,4) mesh: values
    identical, shardings follow the restore template."""
    devices = np.asarray(jax.devices()[:8])
    mesh_a = Mesh(devices.reshape(4, 2), ("data", "model"))
    mesh_b = Mesh(devices.reshape(2, 4), ("data", "model"))

    state = _sharded_state(mesh_a, P("data", "model"))
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save_latest(3, state)
    mngr.wait()

    def as_template(x):
        if x.ndim == 2:
            sh = NamedSharding(mesh_b, P("data", "model"))
        elif x.ndim == 1:
            sh = NamedSharding(mesh_b, P("data"))
        else:
            sh = NamedSharding(mesh_b, P())
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

    template = jax.tree.map(as_template, state)
    restored, step = CheckpointManager(str(tmp_path / "ckpt")).restore_latest(
        template
    )
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(restored.trainable["w"]),
        np.arange(64, dtype=np.float32).reshape(8, 8),
    )
    assert restored.trainable["w"].sharding.mesh.shape["data"] == 2
    assert restored.trainable["w"].sharding.mesh.shape["model"] == 4
    assert restored.trainable["w"].sharding.spec == P("data", "model")
