"""Geometry rotation conversions vs the scipy oracle (the reference's
rotation backend — 7_get_object_trajectory.py:302,316-317)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from egoscaler_tpu.geometry import (
    matrix_from_quat,
    matrix_from_rotvec,
    quat_from_matrix,
    quat_from_rotvec,
    quat_multiply,
    rotvec_from_matrix,
    rotvec_from_quat,
)


def random_rotations(rng, n=64):
    return R.random(n, random_state=np.random.RandomState(7))


def test_quat_from_matrix_matches_scipy(rng):
    rots = random_rotations(rng)
    mats = rots.as_matrix().astype(np.float32)
    ours = np.asarray(quat_from_matrix(jnp.asarray(mats)))
    # oracle: quats reconstructed from the matrices (scipy's as_quat on a
    # Rotation built elsewhere may carry the opposite sign)
    ref = R.from_matrix(mats).as_quat().astype(np.float32)
    # q and -q encode the same rotation; scipy's branch structure should be
    # matched exactly, but allow sign-flip robustness
    agree = np.abs(np.sum(ours * ref, axis=-1))
    np.testing.assert_allclose(agree, 1.0, atol=1e-5)
    # exact sign parity check (Shepperd branch match)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_from_quat_roundtrip(rng):
    rots = random_rotations(rng)
    quats = rots.as_quat().astype(np.float32)
    ours = np.asarray(matrix_from_quat(jnp.asarray(quats)))
    np.testing.assert_allclose(ours, rots.as_matrix(), atol=1e-5)


def test_rotvec_conversions(rng):
    rots = random_rotations(rng)
    rv = rots.as_rotvec().astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(matrix_from_rotvec(jnp.asarray(rv))), rots.as_matrix(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(quat_from_rotvec(jnp.asarray(rv))),
        R.from_rotvec(rv).as_quat(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(rotvec_from_matrix(jnp.asarray(rots.as_matrix().astype(np.float32)))),
        rv,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(rotvec_from_quat(jnp.asarray(rots.as_quat().astype(np.float32)))),
        rv,
        atol=1e-4,
    )


def test_small_angle_rotvec():
    rv = np.array([[1e-8, -2e-8, 3e-9], [0.0, 0.0, 0.0]], np.float32)
    q = np.asarray(quat_from_rotvec(jnp.asarray(rv)))
    ref = R.from_rotvec(rv).as_quat()
    np.testing.assert_allclose(q, ref, atol=1e-7)
    back = np.asarray(rotvec_from_quat(jnp.asarray(q)))
    np.testing.assert_allclose(back, rv, atol=1e-7)


def test_quat_multiply_matches_scipy(rng):
    r1 = R.random(16, random_state=np.random.RandomState(1))
    r2 = R.random(16, random_state=np.random.RandomState(2))
    ours = np.asarray(
        quat_multiply(jnp.asarray(r1.as_quat()), jnp.asarray(r2.as_quat()))
    )
    ref = (r1 * r2).as_quat()
    agree = np.abs(np.sum(ours * ref, axis=-1))
    np.testing.assert_allclose(agree, 1.0, atol=1e-6)
