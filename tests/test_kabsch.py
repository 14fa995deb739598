"""Kabsch alignment vs the reference algorithm (pcm_tools.py:125-158)."""
import numpy as np
from scipy.linalg import svd
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from egoscaler_tpu.geometry import kabsch_rotation, kabsch_se3


def reference_compute_rotation(initial_points, final_points):
    """Transcription of pcm_tools.py:125-158."""
    ci = initial_points.mean(axis=0)
    cf = final_points.mean(axis=0)
    h = (initial_points - ci).T @ (final_points - cf)
    u, s, vt = svd(h)
    v = vt.T
    r = v @ u.T
    if np.linalg.det(r) < 0:
        v[:, -1] *= -1
        r = v @ u.T
    return r


def test_kabsch_parity_clean(rng):
    rot = R.random(random_state=np.random.RandomState(3)).as_matrix()
    pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float64)
    moved = pts @ rot.T + np.array([0.3, -0.1, 0.2])
    ours = np.asarray(kabsch_rotation(jnp.asarray(pts), jnp.asarray(moved)))
    ref = reference_compute_rotation(pts, moved)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    np.testing.assert_allclose(ours, rot, atol=1e-5)


def test_kabsch_parity_noisy(rng):
    rot = R.random(random_state=np.random.RandomState(9)).as_matrix()
    pts = rng.uniform(-1, 1, size=(80, 3))
    moved = pts @ rot.T + rng.normal(scale=0.01, size=(80, 3))
    ours = np.asarray(kabsch_rotation(jnp.asarray(pts), jnp.asarray(moved)))
    ref = reference_compute_rotation(pts, moved)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_kabsch_masked(rng):
    rot = R.random(random_state=np.random.RandomState(5)).as_matrix()
    pts = rng.uniform(-1, 1, size=(64, 3))
    moved = pts @ rot.T
    # corrupt the padded tail; mask should ignore it
    pts_pad = np.concatenate([pts, rng.uniform(-9, 9, size=(16, 3))])
    moved_pad = np.concatenate([moved, rng.uniform(-9, 9, size=(16, 3))])
    mask = np.arange(80) < 64
    ours = np.asarray(
        kabsch_rotation(jnp.asarray(pts_pad), jnp.asarray(moved_pad), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours, rot, atol=1e-5)


def test_kabsch_se3_recovers_transform(rng):
    rot = R.random(random_state=np.random.RandomState(11)).as_matrix()
    t = np.array([0.5, -0.2, 1.1])
    pts = rng.uniform(-1, 1, size=(100, 3))
    moved = pts @ rot.T + t
    r_est, t_est = kabsch_se3(jnp.asarray(pts), jnp.asarray(moved))
    np.testing.assert_allclose(np.asarray(r_est), rot, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-5)
