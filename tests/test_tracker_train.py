"""Tracker training loss decreases on synthetic supervision."""
import numpy as np
import jax
import optax

from egoscaler_tpu.models.tracker import SpaTracker, TrackerConfig
from egoscaler_tpu.training.tracker_train import (
    make_tracker_train_step,
    synthetic_tracking_batch,
    tracking_loss,
)


def test_tracking_loss_zero_at_gt(rng):
    batch = synthetic_tracking_batch(rng)
    losses = tracking_loss(
        batch["gt_tracks"], jax.numpy.full(batch["gt_vis"].shape, 0.999),
        batch["gt_tracks"], batch["gt_vis"],
    )
    assert float(losses["coord"]) < 1e-6
    assert float(losses["vis"]) < 0.01


def test_tracker_trains(rng):
    cfg = TrackerConfig().tiny()
    model = SpaTracker(cfg)
    batch = synthetic_tracking_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["clip"], batch["depths"],
        batch["queries"],
    )
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    step = make_tracker_train_step(model, tx)
    first = None
    for i in range(8):
        params, opt_state, losses = step(params, opt_state, batch)
        if first is None:
            first = float(losses["total"])
    last = float(losses["total"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_distillation_from_lk(rng):
    """The learned tracker improves toward LK pseudo-labels."""
    import jax.numpy as jnp

    from egoscaler_tpu.training.tracker_train import (
        lk_pseudo_labels,
    )

    cfg = TrackerConfig().tiny()
    model = SpaTracker(cfg)
    batch = synthetic_tracking_batch(rng)
    queries = batch["queries"]
    gt_tracks, gt_vis = lk_pseudo_labels(
        batch["clip"], batch["depths"], queries
    )
    dbatch = dict(batch, gt_tracks=gt_tracks, gt_vis=gt_vis)
    params = model.init(
        jax.random.PRNGKey(0), batch["clip"], batch["depths"], queries
    )
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    step = make_tracker_train_step(model, tx)
    first = None
    for _ in range(6):
        params, opt_state, losses = step(params, opt_state, dbatch)
        if first is None:
            first = float(losses["total"])
    assert float(losses["total"]) < first
