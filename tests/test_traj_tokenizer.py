"""Trajectory token codec: round-trips, reference-parser parity, and
device/host agreement."""
import numpy as np
import jax.numpy as jnp

from egoscaler_tpu.configs import TrajTokenConfig, WorkspaceConfig
from egoscaler_tpu.models.traj_tokenizer import (
    TrajTokenizer,
    denormalize_traj,
    discretize,
    normalize_traj,
    undiscretize,
)


def reference_discretize(action_vector, num_bins=256):
    bins = np.linspace(-1, 1, num_bins)
    return (np.digitize(action_vector, bins) - 1).tolist()


def reference_token_to_action(tokens, num_bins=256):
    bins = np.linspace(-1, 1, num_bins)
    return [bins[val] for val in tokens]


def sample_traj(rng, t=20):
    ws = WorkspaceConfig()
    traj = np.zeros((t, 6), np.float32)
    traj[:, 0] = rng.uniform(ws.min_x, ws.max_x, t)
    traj[:, 1] = rng.uniform(ws.min_y, ws.max_y, t)
    traj[:, 2] = rng.uniform(ws.min_z, ws.max_z, t)
    traj[:, 3:] = rng.uniform(-np.pi, np.pi, (t, 3))
    return traj


def test_discretize_matches_reference(rng):
    vals = rng.uniform(-1, 1, size=1000).astype(np.float64)
    ref = np.array(reference_discretize(vals))
    ours = np.asarray(discretize(jnp.asarray(vals)))
    # reference leaves -1-edge values at index -1 only for v < -1; in-range
    # values must agree exactly
    np.testing.assert_array_equal(ours, np.clip(ref, 0, 255))


def test_undiscretize_matches_reference():
    ids = np.arange(256)
    ref = np.array(reference_token_to_action(ids))
    ours = np.asarray(undiscretize(jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_normalize_roundtrip(rng):
    traj = sample_traj(rng)
    normed = normalize_traj(jnp.asarray(traj))
    assert np.all(np.abs(np.asarray(normed)) <= 1.0 + 1e-6)
    back = np.asarray(denormalize_traj(normed))
    np.testing.assert_allclose(back, traj, atol=1e-5)


def test_encode_decode_ids_roundtrip(rng):
    tok = TrajTokenizer()
    traj = sample_traj(rng)
    ids = tok.encode_ids(jnp.asarray(traj))
    assert ids.shape[0] == tok.tokens_per_traj()
    assert int(ids[0]) == tok.ts_id
    assert int(ids[-1]) == tok.te_id
    decoded, count = tok.decode_ids(ids)
    assert int(count) == 20
    # quantization error bound: undiscretize returns the bin LEFT edge
    # (utils.py:18-21), so the error is up to one full bin width per dim,
    # scaled by the denormalization factor of that dim
    bin_w = 2.0 / 255
    scale = np.array([2.0, 2.0, 1.25, np.pi, np.pi, np.pi])
    err = np.abs(np.asarray(decoded) - traj)
    assert np.all(err <= bin_w * scale[None, :] * 1.01 + 1e-5)


def test_encode_decode_str_roundtrip(rng):
    tok = TrajTokenizer()
    traj = sample_traj(rng)
    s = tok.encode_str(traj)
    assert s.startswith("<ts>") and s.endswith("<te>")
    decoded = tok.decode_str(s)
    assert decoded.shape == (20, 6)
    ids_decoded, _ = tok.decode_ids(tok.encode_ids(jnp.asarray(traj)))
    np.testing.assert_allclose(decoded, np.asarray(ids_decoded)[:20], atol=1e-5)


def test_decode_str_malformed_repeats_last(rng):
    """utils.py:91-93: segments that fail to parse repeat the previous
    waypoint."""
    tok = TrajTokenizer()
    traj = sample_traj(rng, t=3)
    s = tok.encode_str(traj)
    # corrupt the middle waypoint
    parts = s.split("<tsep>")
    parts[1] = "<p1> garbled"
    corrupted = "<tsep>".join(parts)
    decoded = tok.decode_str(corrupted)
    assert decoded.shape == (3, 6)
    np.testing.assert_allclose(decoded[1], decoded[0], atol=1e-6)


def test_decode_ids_malformed_repeats_last(rng):
    tok = TrajTokenizer()
    traj = sample_traj(rng, t=4)
    ids = np.asarray(tok.encode_ids(jnp.asarray(traj))).copy()
    # waypoint layout: [ts, b0..b5, tsep, b0..b5, tsep, ...]; corrupt wp1 by
    # replacing its first bin token with another tsep
    ids[8] = tok.tsep_id
    decoded, count = tok.decode_ids(jnp.asarray(ids))
    # string-parser equivalence (utils.py:62-93): the doubled separator adds
    # an empty segment (repeat) and wp1's 5 remaining bins fail to parse
    # (repeat), so 4 waypoints become 5 rows: wp0, wp0, wp0, wp2, wp3
    assert int(count) == 5
    dec = np.asarray(decoded)
    np.testing.assert_allclose(dec[1], dec[0], atol=1e-6)
    np.testing.assert_allclose(dec[2], dec[0], atol=1e-6)


def test_decode_ids_truncated_sequence(rng):
    """A generation cut off mid-trajectory still yields the complete
    waypoints seen so far."""
    tok = TrajTokenizer()
    traj = sample_traj(rng, t=5)
    ids = tok.encode_ids(jnp.asarray(traj))
    cut = ids[: 1 + 7 * 3 + 6]  # ts + 3 full wps + 6 bins of wp3 (no sep)
    decoded, count = tok.decode_ids(cut)
    assert int(count) == 4


def test_numpy_detokenize_matches_jax(rng):
    """Host-side numpy detokenize must equal the device decode_ids on
    well-formed, malformed, and truncated streams."""
    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.training.dataset import TrajectoryDataset, synthetic_samples

    cfg = PointLLMConfig().tiny()
    ds = TrajectoryDataset(cfg, samples=synthetic_samples(cfg, 1))
    tok = ds.tokenizer
    traj = sample_traj(rng, t=6)
    ids = np.asarray(tok.encode_ids(jnp.asarray(traj)))

    cases = [ids]
    bad = ids.copy(); bad[8] = tok.tsep_id; cases.append(bad)
    cases.append(ids[: 1 + 7 * 2 + 6])            # truncated
    cases.append(np.zeros(10, np.int32))          # garbage
    for c in cases:
        jax_traj, n = tok.decode_ids(jnp.asarray(c))
        n = int(n)
        np_traj = ds.detokenize_traj(c)
        if n == 0:
            assert np_traj is None
        else:
            np.testing.assert_allclose(
                np_traj, np.asarray(jax_traj)[:n], atol=1e-5
            )


def test_decode_ids_accepts_numpy_input(rng):
    """decode_ids must work on host numpy arrays (the eval harness feeds
    raw numpy id buffers); the scan body indexes with a tracer."""
    tok = TrajTokenizer()
    traj = sample_traj(rng, t=4)
    ids = np.asarray(tok.encode_ids(jnp.asarray(traj)))
    out_np, n_np = tok.decode_ids(ids)            # numpy in
    out_j, n_j = tok.decode_ids(jnp.asarray(ids)) # jnp in
    assert int(n_np) == int(n_j)
    np.testing.assert_allclose(np.asarray(out_np), np.asarray(out_j))
    # garbage numpy ids must not raise
    tok.decode_ids(rng.integers(0, 40000, 50))
