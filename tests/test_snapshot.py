"""Train-state snapshot round trip: params + optimizer + schedule step.

The resume path must continue the SAME run — Adam moments, schedule
count, and step survive bit-exactly (VERDICT r4: round 4's params-only
resume warm-restarted the optimizer and was blamed for the failed
transfer gate)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
from egoscaler_tpu.models.pointllm import TrajPointLLM
from egoscaler_tpu.training.dataset import (
    BatchLayout,
    TrajectoryDataset,
    synthetic_structured_samples,
)
from egoscaler_tpu.training.snapshot import (
    load_train_snapshot,
    save_train_snapshot,
)
from egoscaler_tpu.training.trainer import create_train_state, make_train_step


@pytest.fixture()
def tiny_setup():
    # function-scoped: make_train_step donates the state, so a state
    # advanced in one test is deleted and unusable in the next
    cfg = PointLLMConfig().tiny()
    model = TrajPointLLM(cfg, remat=False)
    tcfg = TrainConfig(batch_size=2, lr=1e-3, unfreeze_pc_encoder=True,
                       unfreeze_language_model=True)
    ds = TrajectoryDataset(
        cfg, samples=synthetic_structured_samples(cfg, 4, seed=0), seed=0
    )
    batch = next(ds.batches(2, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("input_ids", "attention_mask", "point_clouds")}
    lay = BatchLayout(cfg)
    state, tx = create_train_state(
        model, tcfg, jax.random.PRNGKey(0), batch, total_steps=10
    )
    step_fn = make_train_step(model, tx, lay.prompt_len, 1)
    return model, tcfg, batch, state, tx, step_fn


def test_snapshot_roundtrip_bitexact(tiny_setup, tmp_path):
    model, tcfg, batch, state, tx, step_fn = tiny_setup
    # advance a few steps so moments/step are nontrivial
    for _ in range(3):
        state, _ = step_fn(state, batch)
    path = os.path.join(tmp_path, "snap.npz")
    save_train_snapshot(path, state, meta={"phase": "ft", "epoch": 2})

    # fresh template from the same config
    template, _ = create_train_state(
        model, tcfg, jax.random.PRNGKey(99), batch, total_steps=10
    )
    restored, meta = load_train_snapshot(path, template)
    assert meta == {"phase": "ft", "epoch": 2}
    assert int(restored.step) == int(state.step) == 3

    for k in state.trainable:
        a, b = np.asarray(state.trainable[k]), np.asarray(restored.trainable[k])
        assert a.dtype == b.dtype and np.array_equal(a, b), k
    la = jax.tree_util.tree_leaves(state.opt_state)
    lb = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_snapshot_resume_continues_identically(tiny_setup, tmp_path):
    """step(snapshot-load(state)) == step(state): the resumed run takes
    the exact trajectory the uninterrupted run would have."""
    model, tcfg, batch, state, tx, step_fn = tiny_setup
    for _ in range(2):
        state, _ = step_fn(state, batch)
    path = os.path.join(tmp_path, "snap.npz")
    save_train_snapshot(path, state)
    cont_state, m_direct = step_fn(state, batch)

    template, _ = create_train_state(
        model, tcfg, jax.random.PRNGKey(123), batch, total_steps=10
    )
    restored, _ = load_train_snapshot(path, template)
    res_state, m_resumed = step_fn(restored, batch)
    assert float(m_direct["loss"]) == float(m_resumed["loss"])
    for k in cont_state.trainable:
        assert np.array_equal(
            np.asarray(cont_state.trainable[k]),
            np.asarray(res_state.trainable[k]),
        ), k


def test_snapshot_rejects_mismatched_optimizer(tiny_setup, tmp_path):
    model, tcfg, batch, state, tx, step_fn = tiny_setup
    path = os.path.join(tmp_path, "snap.npz")
    save_train_snapshot(path, state)
    # different freeze config -> different trainable key set
    import dataclasses

    tcfg2 = dataclasses.replace(tcfg, unfreeze_language_model=False)
    template2, _ = create_train_state(
        model, tcfg2, jax.random.PRNGKey(0), batch, total_steps=10
    )
    with pytest.raises(AssertionError):
        load_train_snapshot(path, template2)
