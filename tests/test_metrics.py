"""Metric parity with the reference implementations (metrics.py:7-88),
using scipy + brute-force DTW as oracles."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from egoscaler_tpu.training.metrics import (
    average_displacement_error,
    dynamic_time_warping,
    final_displacement_error,
    geodesic_distance,
    initial_displacement_error,
    trajectory_metrics,
)


def ref_pad(gen, gt):
    if gen.shape[0] > gt.shape[0]:
        return gen[: gt.shape[0]]
    if gen.shape[0] < gt.shape[0]:
        pad = np.repeat(gen[-1:], gt.shape[0] - gen.shape[0], axis=0)
        return np.vstack([gen, pad])
    return gen


def brute_dtw(a, b):
    n, m = len(a), len(b)
    d = np.full((n + 1, m + 1), np.inf)
    d[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = np.linalg.norm(a[i - 1] - b[j - 1])
            d[i, j] = c + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return d[n, m]


def test_ade_fde_ide_equal_length(rng):
    gen = rng.normal(size=(20, 6))
    gt = rng.normal(size=(20, 6))
    ade_ref = np.linalg.norm(gt - gen, axis=1).mean()
    fde_ref = np.linalg.norm(gt[-1] - gen[-1])
    ide_ref = np.linalg.norm(gt[0] - gen[0])
    assert np.isclose(float(average_displacement_error(jnp.asarray(gen), jnp.asarray(gt))), ade_ref, atol=1e-5)
    assert np.isclose(float(final_displacement_error(jnp.asarray(gen), jnp.asarray(gt))), fde_ref, atol=1e-5)
    assert np.isclose(float(initial_displacement_error(jnp.asarray(gen), jnp.asarray(gt))), ide_ref, atol=1e-5)


def test_ade_with_shorter_gen(rng):
    gen = rng.normal(size=(12, 6))
    gt = rng.normal(size=(20, 6))
    padded = ref_pad(gen, gt)
    ade_ref = np.linalg.norm(gt - padded, axis=1).mean()
    # fixed-shape call: gen padded to 20 rows with garbage, gen_len=12
    gen_fix = np.concatenate([gen, np.full((8, 6), 99.0)])
    ours = float(
        average_displacement_error(
            jnp.asarray(gen_fix), jnp.asarray(gt), gen_len=jnp.asarray(12)
        )
    )
    assert np.isclose(ours, ade_ref, atol=1e-5)


def test_dtw_exact(rng):
    a = rng.normal(size=(15, 6))
    b = rng.normal(size=(20, 6))
    ours = float(dynamic_time_warping(jnp.asarray(a), jnp.asarray(b)))
    assert np.isclose(ours, brute_dtw(a, b), atol=1e-4)


def test_geodesic_distance_reference_faithful(rng):
    rots_a = R.random(10, random_state=np.random.RandomState(1))
    rots_b = R.random(10, random_state=np.random.RandomState(2))
    rva, rvb = rots_a.as_rotvec(), rots_b.as_rotvec()
    # reference metrics.py:77-88
    ref = []
    for ga, gb in zip(rva, rvb):
        qa = R.from_rotvec(ga).as_quat()
        qb = R.from_rotvec(gb).as_quat()
        dot = np.dot(qa, qb)
        ref.append(2 * np.arccos(np.clip(dot, -1, 1)))
    ref = np.mean(ref)
    gen = np.concatenate([rva, np.zeros((10, 3))], axis=1)
    gt = np.concatenate([rvb, np.zeros((10, 3))], axis=1)
    ours = float(geodesic_distance(jnp.asarray(rva), jnp.asarray(rvb)))
    assert np.isclose(ours, ref, atol=1e-4)


def test_batched_jit_metrics(rng):
    gen = rng.normal(size=(4, 20, 6)).astype(np.float32)
    gt = rng.normal(size=(4, 20, 6)).astype(np.float32)
    batched = jax.jit(jax.vmap(lambda g, t: trajectory_metrics(g, t)))
    out = batched(jnp.asarray(gen), jnp.asarray(gt))
    assert out["ade"].shape == (4,)
    for i in range(4):
        ade_ref = np.linalg.norm(gt[i] - gen[i], axis=1).mean()
        assert np.isclose(float(out["ade"][i]), ade_ref, atol=1e-4)
        assert np.isclose(float(out["dtw"][i]), brute_dtw(gen[i], gt[i]), atol=1e-3)
