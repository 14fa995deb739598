"""Registration stack tests: synthetic rigid scenes with known transforms.

Tolerance-based parity (RANSAC is stochastic; SURVEY.md §7.2): recovered
transforms must cancel the applied ego-motion to sub-voxel accuracy.
"""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from egoscaler_tpu.configs import PCMConfig
from egoscaler_tpu.registration.voxel import voxel_downsample
from egoscaler_tpu.registration.normals import estimate_normals
from egoscaler_tpu.registration.fpfh import compute_fpfh
from egoscaler_tpu.registration.ransac import match_features, ransac_registration
from egoscaler_tpu.registration.icp import colored_icp
from egoscaler_tpu.registration.pipeline import prepare_cloud, register_pair


def make_scene(rng, n=3000):
    """A structured scene: three walls + clutter with position-derived
    colors (registration needs geometry + color cues)."""
    n_wall = n // 4
    floor = np.stack(
        [rng.uniform(-2, 2, n_wall), rng.uniform(-2, 2, n_wall),
         np.zeros(n_wall)], axis=1)
    wall1 = np.stack(
        [rng.uniform(-2, 2, n_wall), np.full(n_wall, -2.0),
         rng.uniform(0, 2, n_wall)], axis=1)
    wall2 = np.stack(
        [np.full(n_wall, 2.0), rng.uniform(-2, 2, n_wall),
         rng.uniform(0, 2, n_wall)], axis=1)
    clutter = rng.uniform(-1.5, 1.5, (n - 3 * n_wall, 3)) * [1, 1, 0.4] + [0, 0, 0.4]
    pts = np.concatenate([floor, wall1, wall2, clutter]).astype(np.float32)
    cols = (np.sin(pts * [3.1, 5.3, 7.7]) * 0.5 + 0.5).astype(np.float32)
    return pts, cols


def rigid(pts, angle_deg, axis, t):
    rot = R.from_rotvec(np.deg2rad(angle_deg) * np.asarray(axis)).as_matrix()
    return (pts @ rot.T + t).astype(np.float32), rot


def test_voxel_downsample_counts(rng):
    pts, cols = make_scene(rng, 2000)
    mask = np.ones(len(pts), bool)
    out_p, out_c, out_m = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(mask), 0.1, 4096
    )
    m = np.asarray(out_m)
    assert 100 < m.sum() < 2000
    # voxel means stay inside the scene bounds
    p = np.asarray(out_p)[m]
    assert p[:, 2].min() >= -0.25 and p[:, 2].max() <= 2.1


def test_voxel_downsample_masks_input(rng):
    pts, cols = make_scene(rng, 1000)
    pts_pad = np.concatenate([pts, np.full((200, 3), 77.0, np.float32)])
    cols_pad = np.concatenate([cols, np.zeros((200, 3), np.float32)])
    mask = np.arange(1200) < 1000
    _, _, m1 = voxel_downsample(
        jnp.asarray(pts_pad), jnp.asarray(cols_pad), jnp.asarray(mask), 0.1, 4096
    )
    _, _, m2 = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(cols), jnp.ones(1000, bool), 0.1, 4096
    )
    assert int(m1.sum()) == int(m2.sum())


def test_voxel_downsample_all_masked_is_finite(rng):
    """All-False mask (e.g. a frame whose pixels are all invalid): the
    packed path must not reconstruct NaN points from the +inf origin."""
    pts, cols = make_scene(rng, 500)
    mask = np.zeros(500, bool)
    out_p, out_c, out_m = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(mask), 0.1, 1024
    )
    assert not bool(np.asarray(out_m).any())
    assert np.isfinite(np.asarray(out_p)).all()
    assert np.isfinite(np.asarray(out_c)).all()


def test_voxel_downsample_packed_matches_exact(rng):
    """The packed int32 sort (default) matches the exact f32 payload sort
    to its documented quantization: <= voxel/1024 per point axis, exact
    colors for uint8-sourced values."""
    pts = rng.uniform(-2.0, 2.0, (20000, 3)).astype(np.float32)
    cols = (rng.integers(0, 256, (20000, 3)) / 255.0).astype(np.float32)
    mask = rng.random(20000) < 0.9
    p1, c1, m1 = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(mask), 0.1, 4096,
        packed=False,
    )
    p2, c2, m2 = voxel_downsample(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(mask), 0.1, 4096,
        packed=True,
    )
    m1, m2 = np.asarray(m1), np.asarray(m2)
    assert (m1 == m2).all()
    assert np.abs(np.asarray(p1)[m1] - np.asarray(p2)[m1]).max() < 2e-4
    assert np.abs(np.asarray(c1)[m1] - np.asarray(c2)[m1]).max() < 1e-6


def test_normals_on_plane(rng):
    """Floor points -> normals ~ +-z, oriented toward camera origin."""
    pts = np.stack(
        [rng.uniform(-1, 1, 500), rng.uniform(-1, 1, 500),
         np.full(500, 2.0)], axis=1).astype(np.float32)
    mask = np.ones(500, bool)
    n = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(mask), 0.3))
    # plane at z=2 in front of camera at origin: normals point to -z
    assert np.abs(n[:, 2] + 1.0).max() < 0.05


def test_fpfh_rotation_invariance(rng):
    """FPFH is (approximately) invariant under rigid motion."""
    pts, cols = make_scene(rng, 1500)
    mask = jnp.ones(len(pts), bool)
    moved, rot = rigid(pts, 25, [0.2, 0.9, 0.1], [0.4, -0.2, 0.3])

    def feats(p):
        pj = jnp.asarray(p)
        n = estimate_normals(pj, mask, 0.2)
        return np.asarray(compute_fpfh(pj, n, mask, 0.5))

    f1, f2 = feats(pts), feats(moved)
    # same point order -> rowwise comparison; histograms shift slightly
    # from neighbor-set changes, so compare distributions loosely
    rel = np.linalg.norm(f1 - f2, axis=1) / (np.linalg.norm(f1, axis=1) + 1e-6)
    assert np.median(rel) < 0.35


def test_full_registration_recovers_motion(rng):
    pts, cols = make_scene(rng, 4000)
    # ego-motion between frames: ~3 deg rotation + 8 cm translation
    moved, rot = rigid(pts, 3.0, [0.1, 0.95, 0.05], [0.05, -0.03, 0.05])
    mask = jnp.ones(len(pts), bool)
    res = register_pair(
        jnp.asarray(moved), jnp.asarray(cols), mask,
        jnp.asarray(pts), jnp.asarray(cols), mask,
        max_keypoints=2048, num_hypotheses=1024,
        key=jax.random.PRNGKey(0),
    )
    tf = np.asarray(res.transformation)
    # applying tf to moved should recover pts: tf ~= inverse of the motion
    rec = moved @ tf[:3, :3].T + tf[:3, 3]
    err = np.linalg.norm(rec - pts, axis=1)
    assert np.median(err) < 0.03, (np.median(err), float(res.fitness))
    assert float(res.fitness) > 0.5


def test_icp_refines_coarse_init(rng):
    pts, cols = make_scene(rng, 3000)
    moved, rot = rigid(pts, 2.0, [0, 1, 0], [0.04, 0.0, 0.02])
    mask = jnp.ones(len(pts), bool)
    sp, sc, sn, sf, sm = prepare_cloud(
        jnp.asarray(moved), jnp.asarray(cols), mask, max_keypoints=2048
    )
    tp, tc, tn, tf_, tm = prepare_cloud(
        jnp.asarray(pts), jnp.asarray(cols), mask, max_keypoints=2048
    )
    res = colored_icp(
        sp, sc, sm, tp, tc, tn, tm,
        init_transform=jnp.eye(4),
        distance_threshold=0.04 * 3,
        gradient_radius=0.2,
        max_iterations=30,
    )
    tf = np.asarray(res.transformation)
    rec = moved @ tf[:3, :3].T + tf[:3, 3]
    err = np.linalg.norm(rec - pts, axis=1)
    assert np.median(err) < 0.02, np.median(err)


def test_nearest_pallas_matches_bruteforce(rng):
    """Fused Pallas NN kernel (interpret mode on CPU) vs numpy."""
    import jax.numpy as jnp

    from egoscaler_tpu.ops.nearest_pallas import nearest_neighbor

    for qn, mn in [(513, 1025), (128, 128)]:
        q = rng.normal(size=(qn, 3)).astype(np.float32)
        p = rng.normal(size=(mn, 3)).astype(np.float32)
        mask = rng.random(mn) > 0.3
        idx, d2 = nearest_neighbor(jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask))
        dd = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        dd[:, ~mask] = 1e30
        np.testing.assert_array_equal(np.asarray(idx), dd.argmin(1))
        np.testing.assert_allclose(np.asarray(d2), dd.min(1), atol=1e-4)


def test_icp_converges_early_same_result(rng):
    """The while_loop criteria must reproduce the fixed-30-iteration
    transform on a well-initialized pair (Open3D ICPConvergenceCriteria
    semantics: |dfitness| and |drmse| < 1e-6)."""
    import jax.numpy as jnp

    from egoscaler_tpu.registration.icp import colored_icp

    pts, cols = make_scene(rng, 2000)
    moved, _ = rigid(pts, 1.5, [0, 1, 0], [0.03, 0.0, 0.015])
    mask = jnp.ones(len(pts), bool)
    sp, sc, sn, sf, sm = prepare_cloud(
        jnp.asarray(moved), jnp.asarray(cols), mask, max_keypoints=2048
    )
    tp, tc, tn, tf_, tm = prepare_cloud(
        jnp.asarray(pts), jnp.asarray(cols), mask, max_keypoints=2048
    )

    def run(iters):
        return np.asarray(
            colored_icp(
                sp, sc, sm, tp, tc, tn, tm, init_transform=jnp.eye(4),
                distance_threshold=0.12, gradient_radius=0.2,
                max_iterations=iters,
            ).transformation
        )

    np.testing.assert_allclose(run(30), run(100), atol=1e-4)
