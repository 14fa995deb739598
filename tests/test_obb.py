"""Oriented bounding box + outlier removal behavior tests.

Open3D is not available on TPU hosts; these tests check the geometric
invariants the pipeline relies on (SURVEY.md §2.3 'OBB via PCA'):
containment of inliers, tightness along principal axes, and outlier
rejection equivalent to Open3D's statistical filter definition.
"""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from egoscaler_tpu.geometry import (
    minimum_3dbox,
    oriented_bounding_box,
    statistical_outlier_mask,
)


def test_outlier_mask_rejects_far_points(rng):
    pts = rng.normal(scale=0.05, size=(100, 3))
    pts[0] = [5.0, 5.0, 5.0]  # gross outlier
    mask = np.asarray(statistical_outlier_mask(jnp.asarray(pts)))
    assert not mask[0]
    assert mask[1:].mean() > 0.9


def test_outlier_mask_respects_input_mask(rng):
    pts = rng.normal(scale=0.05, size=(64, 3))
    in_mask = np.ones(64, bool)
    in_mask[50:] = False
    pts[50:] = 100.0  # padded garbage must not affect stats
    out = np.asarray(
        statistical_outlier_mask(jnp.asarray(pts), jnp.asarray(in_mask))
    )
    assert not out[50:].any()
    assert out[:50].mean() > 0.9


def test_obb_axis_aligned_box(rng):
    pts = rng.uniform(-1, 1, size=(500, 3)) * np.array([2.0, 1.0, 0.5])
    center, axes, extent = oriented_bounding_box(jnp.asarray(pts))
    extent = np.sort(np.asarray(extent))[::-1]
    # PCA axes of uniformly sampled boxes deviate slightly from the true
    # box axes (sampling covariance) — allow 10% slack (documented
    # approximation, SURVEY.md §2.3)
    assert np.all(extent <= np.array([4.0, 2.0, 1.0]) * 1.10)
    assert np.all(extent >= np.array([4.0, 2.0, 1.0]) * 0.85)
    np.testing.assert_allclose(np.asarray(center), 0.0, atol=0.1)


def test_obb_rotated_box_recovers_extent(rng):
    rot = R.random(random_state=np.random.RandomState(4)).as_matrix()
    pts = rng.uniform(-1, 1, size=(800, 3)) * np.array([2.0, 1.0, 0.25])
    pts = pts @ rot.T
    _, axes, extent = oriented_bounding_box(jnp.asarray(pts))
    extent = np.sort(np.asarray(extent))[::-1]
    np.testing.assert_allclose(extent, [4.0, 2.0, 0.5], rtol=0.1)


def test_minimum_3dbox_contains_inliers(rng):
    pts = rng.normal(scale=0.1, size=(128, 3)) + np.array([1.0, 0.5, 2.0])
    corners, ok = minimum_3dbox(jnp.asarray(pts))
    assert bool(ok)
    corners = np.asarray(corners)
    assert corners.shape == (8, 3)
    center = corners.mean(axis=0)
    np.testing.assert_allclose(center, [1.0, 0.5, 2.0], atol=0.1)


def test_minimum_3dbox_too_few_points(rng):
    pts = np.zeros((8, 3))
    pts[:3] = rng.normal(size=(3, 3))
    mask = np.arange(8) < 3
    _, ok = minimum_3dbox(jnp.asarray(pts), jnp.asarray(mask))
    assert not bool(ok)
