"""Tracker quality: the trained window tracker must beat pyramidal LK on
held-out clips with occlusion + reappearance (VERDICT round-1 bar; the
reference capability is SpaTracker's pretrained tracking through
occlusion, predictor.py:37-78).

Weights come from scripts/train_tracker.py (checked-in asset).  The
eval regime is the post-occlusion third of each clip: frame-pair LK has
no memory and sticks to the occluder; the window tracker attends over
the full clip.
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from egoscaler_tpu.models.tracker import SpaTracker, TrackerConfig
from egoscaler_tpu.ops.lucas_kanade import lk_track_clip
from egoscaler_tpu.training.tracker_train import occlusion_tracking_batch

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "egoscaler_tpu", "assets", "tracker_occlusion.npz",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ASSET), reason="tracker weights not trained yet"
)


@pytest.fixture(scope="module")
def tracker():
    from egoscaler_tpu.models.tracker import load_tracker_asset

    cfg, params = load_tracker_asset(ASSET)
    return SpaTracker(cfg), params


def test_learned_tracker_beats_lk_under_occlusion(tracker):
    model, params = tracker
    fwd = jax.jit(lambda c, d, q: model.apply(params, c, d, q))
    lk = jax.jit(lambda c, d, q: lk_track_clip(c, d, q))

    rng = np.random.default_rng(999)  # held-out: differs from train+script eval
    t = 8
    learned, lk_errs = [], []
    for _ in range(8):
        b = occlusion_tracking_batch(rng, t=t, h=64, w=64, q=8)
        gt = np.asarray(b["gt_tracks"])[..., :2]
        pred, vis = fwd(b["clip"], b["depths"], b["queries"])
        pred = np.asarray(pred)[..., :2]
        lk_tracks = np.asarray(lk(b["clip"], b["depths"], b["queries"][:, :2]))
        tail = slice(2 * t // 3, None)
        learned.append(np.linalg.norm(pred[tail] - gt[tail], axis=-1).mean())
        lk_errs.append(
            np.linalg.norm(lk_tracks[tail, :, :2] - gt[tail], axis=-1).mean()
        )
    learned_err = float(np.mean(learned))
    lk_err = float(np.mean(lk_errs))
    assert learned_err < lk_err, (learned_err, lk_err)
    # and not merely "less bad": reacquisition within a few pixels
    assert learned_err < 6.0, learned_err


def test_learned_tracker_visibility_flags_occlusion(tracker):
    model, params = tracker
    rng = np.random.default_rng(7)
    b = occlusion_tracking_batch(rng, t=8, h=64, w=64, q=8)
    _, vis = model.apply(params, b["clip"], b["depths"], b["queries"])
    vis = np.asarray(vis)
    gt_vis = np.asarray(b["gt_vis"])
    if gt_vis.all() or not gt_vis.any():
        pytest.skip("degenerate clip: no occlusion happened")
    # predicted visibility must separate occluded from visible on average
    assert vis[gt_vis].mean() > vis[~gt_vis].mean()


def test_shipped_asset_is_scaled_config(tracker):
    """Round-5 gate: the committed asset must be the SCALED architecture
    (VERDICT r4 carried item — the tiny feat_dim-32 depth-1/1 asset is
    no longer acceptable).  The sidecar config is what every consumer
    (stage 7, bench, golden demo) builds."""
    model, _ = tracker
    cfg = model.cfg
    assert cfg.feat_dim >= 128, cfg
    assert cfg.space_depth >= 4 and cfg.time_depth >= 4, cfg
    assert cfg.window >= 12, cfg
