"""SpaTracker architecture tests (tiny config, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from egoscaler_tpu.models.tracker import (
    SpaTracker,
    SpaTrackerPredictor,
    TrackerConfig,
    corr_features,
    lift_triplanes,
)


def test_forward_shapes(rng):
    cfg = TrackerConfig().tiny()
    model = SpaTracker(cfg)
    clip = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 3, (4, 32, 32)).astype(np.float32))
    queries = jnp.asarray(
        np.array([[10.0, 12.0, 2.0], [20.0, 8.0, 1.5]], np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), clip, depths, queries)
    tracks, vis = model.apply(params, clip, depths, queries)
    assert tracks.shape == (4, 2, 3)
    assert vis.shape == (4, 2)
    assert np.isfinite(np.asarray(tracks)).all()
    # zero-init delta head: before training, frame-0 coords == queries
    np.testing.assert_allclose(
        np.asarray(tracks[0, :, :2]), np.asarray(queries[:, :2]), atol=1e-4
    )


def test_triplane_shapes(rng):
    feats = jnp.asarray(rng.normal(size=(2, 8, 10, 16)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0, 8, (2, 8, 10)).astype(np.float32))
    xy, xz, yz = lift_triplanes(feats, depth, z_planes=6)
    assert xy.shape == (2, 8, 10, 16)
    assert xz.shape == (2, 6, 10, 16)
    assert yz.shape == (2, 8, 6, 16)
    assert np.isfinite(np.asarray(xz)).all()


def test_corr_features_peak(rng):
    """Correlation is maximal where the template matches."""
    t, h, w, c = 1, 16, 16, 8
    fm = jnp.asarray(rng.normal(size=(t, h, w, c)).astype(np.float32))
    tf = fm[0, 5, 7]  # template = feature at (x=7, y=5)
    coords = jnp.asarray(np.array([[[7.0, 5.0]]], np.float32))  # centered
    corr = np.asarray(
        corr_features(fm, tf[None], coords, radius=2, levels=1)
    )[0, 0]
    center = corr.reshape(5, 5)[2, 2]
    assert center >= corr.max() - 1e-4


def test_sliding_window_predictor(rng):
    cfg = TrackerConfig().tiny()
    model = SpaTracker(cfg)
    clip = jnp.asarray(rng.uniform(0, 1, (10, 32, 32, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 3, (10, 32, 32)).astype(np.float32))
    queries = jnp.asarray(np.array([[10.0, 12.0, 2.0]], np.float32))
    params = model.init(
        jax.random.PRNGKey(0), clip[: cfg.window], depths[: cfg.window], queries
    )
    pred = SpaTrackerPredictor(model, params)
    tracks = pred(clip, depths, queries)
    assert tracks.shape == (10, 1, 3)
    assert np.isfinite(np.asarray(tracks)).all()


def test_predictor_overlap_assembly(rng):
    """Output frame t must come from the window that covers t with the
    correct seed — the old host loop emitted every window's full span
    then truncated, re-labelling overlap frames (fixed in round 2)."""
    cfg = TrackerConfig().tiny()  # window=4 -> stride 2, windows 0,2,4,6,8,12
    model = SpaTracker(cfg)
    t, h, w = 16, 32, 32
    clip = jnp.asarray(rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 3, (t, h, w)).astype(np.float32))
    queries = jnp.asarray(np.array([[10.0, 12.0, 2.0]], np.float32))
    win = cfg.window
    params = model.init(
        jax.random.PRNGKey(0), clip[:win], depths[:win], queries
    )
    pred = SpaTrackerPredictor(model, params)
    out = np.asarray(pred(clip, depths, queries))
    assert out.shape == (t, 1, 3)

    # reference assembly: explicit window loop with per-window reseeding
    stride = win // 2
    starts = list(range(stride, t - win + 1, stride))
    if starts[-1] != t - win:
        starts.append(t - win)
    tracks, _ = model.apply(params, clip[:win], depths[:win], queries)
    expect = [np.asarray(tracks)]
    prev = 0
    for s in starts:
        seed = tracks[s - prev]
        tracks, _ = model.apply(
            params, clip[s:s + win], depths[s:s + win], seed
        )
        expect.append(np.asarray(tracks)[prev + win - s:])
        prev = s
    expect = np.concatenate(expect, axis=0)
    assert expect.shape == (t, 1, 3)
    np.testing.assert_allclose(out, expect, atol=1e-5)
