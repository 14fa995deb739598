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


def test_hard_tracking_batch_invariants(rng):
    """Round-4 multi-object corpus: real occlusions, per-object depth
    planes, queries anchored to gt frame 0."""
    import numpy as np

    from egoscaler_tpu.training.tracker_train import hard_tracking_batch

    nprng = np.random.default_rng(0)
    b = hard_tracking_batch(nprng, t=8, h=64, w=64, q=10, n_obj=3,
                            occ_frac=0.5)
    clip = np.asarray(b["clip"])
    depths = np.asarray(b["depths"])
    gt = np.asarray(b["gt_tracks"])
    vis = np.asarray(b["gt_vis"])
    assert clip.shape == (8, 64, 64, 3)
    assert depths.shape == (8, 64, 64)
    assert gt.shape == (8, 10, 3) and vis.shape == (8, 10)
    assert np.isfinite(clip).all() and np.isfinite(gt).all()
    # occluder strip is nearest-depth; background/objects span planes
    assert depths.min() > 0.5 and depths.max() < 4.0
    assert len(np.unique(np.round(depths[0], 3))) > 10
    # the centered occluder actually hides tracked points mid-clip
    assert (~vis[2:6]).sum() > 0
    # boundary frames are fully visible modulo object-object occlusion
    np.testing.assert_allclose(np.asarray(b["queries"]), gt[0])
    # gt z matches the depth plane of the carrying object where visible
    xs = np.clip(np.round(gt[0, :, 0]).astype(int), 0, 63)
    ys = np.clip(np.round(gt[0, :, 1]).astype(int), 0, 63)
    on_plane = np.abs(depths[0, ys, xs] - gt[0, :, 2]) < 1e-3
    assert on_plane[vis[0]].mean() > 0.8


def test_hard_batch_trains(rng):
    """One tiny model takes gradient steps on the hard corpus."""
    import numpy as np

    from egoscaler_tpu.training.tracker_train import hard_tracking_batch

    cfg = TrackerConfig().tiny()
    model = SpaTracker(cfg)
    nprng = np.random.default_rng(1)
    batch = hard_tracking_batch(nprng, t=4, h=32, w=32, q=6, n_obj=2)
    params = model.init(
        jax.random.PRNGKey(0), batch["clip"], batch["depths"],
        batch["queries"],
    )
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    step = make_tracker_train_step(model, tx)
    first = None
    for _ in range(4):
        params, opt_state, losses = step(params, opt_state, batch)
        if first is None:
            first = float(losses["total"])
    assert np.isfinite(float(losses["total"]))
    assert float(losses["total"]) < first
