"""Training harness tests: loss decreases, freezing respected, grad accum."""
import numpy as np
import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
from egoscaler_tpu.models.pointllm import TrajPointLLM
from egoscaler_tpu.training.dataset import (
    BatchLayout,
    TrajectoryDataset,
    synthetic_samples,
)
from egoscaler_tpu.training.trainer import (
    create_train_state,
    make_train_step,
    partition_params,
    frozen_patterns,
)


def setup(batch=2, accum=1):
    cfg = PointLLMConfig().tiny()
    tcfg = TrainConfig(batch_size=batch, grad_accum_steps=accum, lr=1e-3)
    model = TrajPointLLM(cfg, remat=False)
    ds = TrajectoryDataset(cfg, samples=synthetic_samples(cfg, 8), seed=0)
    batch_data = next(ds.batches(batch))
    batch_data = {k: jnp.asarray(v) for k, v in batch_data.items()
                  if k in ("input_ids", "attention_mask", "point_clouds")}
    state, tx = create_train_state(
        model, tcfg, jax.random.PRNGKey(0), batch_data, total_steps=100
    )
    lay = BatchLayout(cfg)
    step = make_train_step(model, tx, lay.prompt_len, accum, donate=False)
    return model, cfg, tcfg, ds, state, step, batch_data


def test_loss_decreases():
    model, cfg, tcfg, ds, state, step, batch = setup()
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_frozen_params_unchanged():
    model, cfg, tcfg, ds, state, step, batch = setup()
    frozen_before = jax.tree_util.tree_map(np.asarray, state.frozen)
    trainable_before = jax.tree_util.tree_map(np.asarray, state.trainable)
    # two steps: warmup lr is 0 at step 0, so one step leaves params intact
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    for k, v in state.frozen.items():
        np.testing.assert_array_equal(np.asarray(v), frozen_before[k])
    changed = any(
        not np.allclose(np.asarray(state.trainable[k]), trainable_before[k])
        for k in state.trainable
    )
    assert changed


def test_freeze_partition_matches_reference():
    """model_arch.py:33-51: point_backbone + layers frozen; embed_tokens,
    point_proj, lm_head, final norm trainable."""
    model, cfg, tcfg, ds, state, step, batch = setup()
    frozen_keys = set(state.frozen)
    trainable_keys = set(state.trainable)
    assert any("point_backbone" in k for k in frozen_keys)
    assert any("model/layers_0" in k for k in frozen_keys)
    assert any("embed_tokens" in k for k in trainable_keys)
    assert any("point_proj" in k for k in trainable_keys)
    assert any("lm_head" in k for k in trainable_keys)
    assert not any("point_backbone" in k for k in trainable_keys)


def test_grad_accum_matches_full_batch():
    """accum=2 over batch 4 == single step over batch 4 (same grads)."""
    model, cfg, tcfg, ds, state, step4, _ = setup(batch=4, accum=1)
    lay = BatchLayout(cfg)
    batch = next(ds.batches(4))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("input_ids", "attention_mask", "point_clouds")}
    from egoscaler_tpu.training.trainer import make_optimizer
    tx = make_optimizer(tcfg, 100)
    step_acc = make_train_step(model, tx, lay.prompt_len, 2, donate=False)

    s1, m1 = step4(state, batch)
    state2 = type(state)(state.trainable, state.frozen,
                         tx.init(state.trainable), jnp.asarray(0))
    s2, m2 = step_acc(state2, batch)
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)
    for k in s1.trainable:
        np.testing.assert_allclose(
            np.asarray(s1.trainable[k]), np.asarray(s2.trainable[k]), atol=1e-5
        )


def test_dataset_layout():
    cfg = PointLLMConfig().tiny()
    ds = TrajectoryDataset(cfg, samples=synthetic_samples(cfg, 4))
    lay = BatchLayout(cfg)
    b = next(ds.batches(2))
    assert b["input_ids"].shape == (2, lay.total_len)
    assert b["point_clouds"].shape == (2, cfg.point_bert.npoints, 6)
    ids = b["input_ids"][0]
    tok = ds.tokenizer
    # prompt structure
    assert ids[0] == cfg.point_start_token_id
    assert (ids[1:1 + lay.n_patch] == cfg.point_patch_token_id).all()
    assert ids[1 + lay.n_patch] == cfg.point_end_token_id
    assert ids[lay.prompt_len - 8] == tok.ts_id
    assert ids[lay.prompt_len - 1] == tok.tsep_id
    assert ids[lay.total_len - 2] == tok.te_id
    # round-trip: detokenize the answer -> close to gt
    answer = ids[lay.prompt_len - 8:]
    traj = ds.detokenize_traj(np.asarray(answer))
    assert traj is not None and traj.shape == (cfg.traj.num_steps, 6)
    gt = b["gt_traj"][0]
    assert np.abs(traj - gt).max() < 0.05
