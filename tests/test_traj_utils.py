"""preprocess_traj / smoothing_traj parity with the reference numpy
implementation (models/utils/traj_utils.py)."""
import numpy as np
import jax.numpy as jnp

from egoscaler_tpu.geometry import preprocess_traj, smoothing_traj


def reference_preprocess_traj(traj, num_steps):
    t, d = traj.shape
    if t >= num_steps:
        indices = np.linspace(0, t - 1, num_steps).astype(int)
        sampled = traj[indices]
        mask = np.ones(num_steps, dtype=int)
    else:
        pad = np.tile(traj[-1], (num_steps - t, 1))
        sampled = np.vstack([traj, pad])
        mask = np.concatenate([np.ones(t, int), np.zeros(num_steps - t, int)])
    return sampled, mask


def reference_smoothing_traj(traj):
    pos_seq = traj[:, :3]
    n = pos_seq.shape[0]
    out = []
    for j in range(n):
        if j == 0:
            if n >= 3:
                mean = (3 * pos_seq[j] + pos_seq[j + 1] + pos_seq[j + 2]) / 5
            elif n == 2:
                mean = (3 * pos_seq[j] + pos_seq[j + 1]) / 4
            else:
                mean = pos_seq[j]
        elif j == 1:
            if n >= 4:
                mean = (2 * pos_seq[j - 1] + pos_seq[j] + pos_seq[j + 1] + pos_seq[j + 2]) / 5
            elif n == 3:
                mean = (2 * pos_seq[j - 1] + pos_seq[j] + pos_seq[j + 1]) / 4
            else:
                mean = pos_seq[j]
        elif j == n - 2:
            if n >= 4:
                mean = (pos_seq[j - 2] + pos_seq[j - 1] + pos_seq[j] + pos_seq[j + 1]) / 4
            elif n == 3:
                mean = (pos_seq[j - 1] + pos_seq[j] + pos_seq[j + 1]) / 3
            else:
                mean = pos_seq[j]
        elif j == n - 1:
            if n >= 3:
                mean = (pos_seq[j - 2] + pos_seq[j - 1] + pos_seq[j]) / 3
            elif n == 2:
                mean = (pos_seq[j - 1] + pos_seq[j]) / 2
            else:
                mean = pos_seq[j]
        else:
            mean = (pos_seq[j - 2] + pos_seq[j - 1] + pos_seq[j] + pos_seq[j + 1] + pos_seq[j + 2]) / 5
        out.append(mean)
    return np.concatenate([np.array(out), traj[:, 3:]], axis=-1)


def test_preprocess_downsample(rng):
    for t in [20, 21, 35, 60, 80]:
        traj = rng.normal(size=(t, 6)).astype(np.float32)
        ref, ref_mask = reference_preprocess_traj(traj, 20)
        padded = np.zeros((80, 6), np.float32)
        padded[:t] = traj
        ours, mask = preprocess_traj(jnp.asarray(padded), t, 20)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(mask), ref_mask)


def test_preprocess_pad(rng):
    for t in [3, 7, 19]:
        traj = rng.normal(size=(t, 6)).astype(np.float32)
        ref, ref_mask = reference_preprocess_traj(traj, 20)
        padded = np.zeros((80, 6), np.float32)
        padded[:t] = traj
        ours, mask = preprocess_traj(jnp.asarray(padded), t, 20)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(mask), ref_mask)


def test_smoothing_parity(rng):
    for t in [2, 3, 4, 5, 10, 20]:
        traj = rng.normal(size=(t, 6)).astype(np.float32)
        ref = reference_smoothing_traj(traj)
        ours = np.asarray(smoothing_traj(jnp.asarray(traj), t))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_smoothing_padded_rows_untouched(rng):
    traj = rng.normal(size=(10, 6)).astype(np.float32)
    padded = np.concatenate([traj, np.full((5, 6), 7.0, np.float32)])
    out = np.asarray(smoothing_traj(jnp.asarray(padded), 10))
    ref = reference_smoothing_traj(traj)
    np.testing.assert_allclose(out[:10], ref, atol=1e-5)
    np.testing.assert_allclose(out[10:, :3], 7.0)
