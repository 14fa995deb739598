"""End-to-end trajectory extraction on synthetic rendered clips.

A dense textured world point cloud is splatted into per-frame RGBD
images under known camera ego-motion; a tracked object moves rigidly.
The pipeline must cancel the ego-motion and recover the object's world
trajectory (tolerance-based parity, SURVEY.md §7).
"""
import numpy as np
import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import DataConfig, PCMConfig
from egoscaler_tpu.pipelines.trajectory import extract_trajectory, validate_tracks

H = W = 96
F = 80.0
PP = 47.5


def render_frame(world_pts, world_cols, cam_pos):
    """Splat world points into an RGBD image from a camera at cam_pos
    (axis-aligned, looking +z)."""
    p = world_pts - cam_pos
    z = p[:, 2]
    front = z > 0.2
    u = np.round(F * p[:, 0] / z + PP).astype(int)
    v = np.round(F * p[:, 1] / z + PP).astype(int)
    ok = front & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    depth = np.zeros((H, W), np.float32)
    color = np.zeros((H, W, 3), np.float32)
    order = np.argsort(-z)  # far first; near overwrites (painter's algo)
    for i in np.nonzero(ok)[0][np.argsort(-z[ok])]:
        depth[v[i], u[i]] = z[i]
        color[v[i], u[i]] = world_cols[i]
    rgbd = np.concatenate([color * 255.0, depth[..., None]], axis=-1)
    return rgbd


def make_world(rng, n=25000):
    """Textured wavy backdrop plus side structure."""
    xy = rng.uniform(-1.6, 1.6, (n, 2))
    z = 2.0 + 0.25 * np.sin(3.0 * xy[:, 0]) * np.cos(2.0 * xy[:, 1])
    pts = np.concatenate([xy, z[:, None]], axis=1).astype(np.float32)
    cols = np.stack(
        [
            0.5 + 0.5 * np.sin(5.0 * pts[:, 0]),
            0.5 + 0.5 * np.cos(4.0 * pts[:, 1]),
            0.5 + 0.5 * np.sin(3.0 * pts[:, 2] * pts[:, 0]),
        ],
        axis=1,
    ).clip(0.05, 1.0).astype(np.float32)
    return pts, cols


def make_clip(rng, t=4, cam_step=(0.04, 0.0, 0.0), obj_step=(0.03, 0.0, 0.0)):
    world_pts, world_cols = make_world(rng)
    obj_center0 = np.array([0.0, 0.0, 1.2], np.float32)
    obj_local = rng.uniform(-0.08, 0.08, (24, 3)).astype(np.float32)

    obj_cols = np.tile(np.array([[0.9, 0.2, 0.1]], np.float32), (len(obj_local), 1))

    frames, masks, tracks = [], [], []
    for ti in range(t):
        cam = np.array(cam_step, np.float32) * ti
        # object (world) position this frame
        obj_c = obj_center0 + np.array(obj_step, np.float32) * ti
        # render backdrop + the object itself (the tracker samples depth at
        # track pixels, which must land on the object — 7_get:221-224)
        scene_pts = np.concatenate([world_pts, obj_local + obj_c])
        scene_cols = np.concatenate([world_cols, obj_cols])
        rgbd = render_frame(scene_pts, scene_cols, cam)
        obj_pts_cam = obj_local + obj_c - cam
        u = F * obj_pts_cam[:, 0] / obj_pts_cam[:, 2] + PP
        v = F * obj_pts_cam[:, 1] / obj_pts_cam[:, 2] + PP
        tracks.append(np.stack([u, v, obj_pts_cam[:, 2]], axis=1))
        # bbox mask over the object region (registration uses background)
        m = np.zeros((H, W), bool)
        u0, u1 = int(u.min()) - 2, int(u.max()) + 3
        v0, v1 = int(v.min()) - 2, int(v.max()) + 3
        m[max(v0, 0):v1, max(u0, 0):u1] = True
        frames.append(rgbd)
        masks.append(m)
    return (
        np.stack(frames),
        np.stack(masks),
        np.stack(tracks).astype(np.float32),
    )


def small_cfg():
    return DataConfig(
        pcm=PCMConfig(voxel_size=0.1, ransac_max_iters=512, icp_max_iters=20)
    )


def run(rng, cam_step, obj_step, t=4):
    frames, masks, tracks = make_clip(rng, t, cam_step, obj_step)
    res = extract_trajectory(
        jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(tracks),
        jnp.asarray(t), F, PP, cfg=small_cfg(),
        max_keypoints=1024, num_hypotheses=512, key=jax.random.PRNGKey(0),
    )
    return res, frames, tracks


def test_static_camera_moving_object(rng):
    res, frames, tracks = run(rng, cam_step=(0, 0, 0), obj_step=(0.03, 0, 0))
    assert bool(res.ok)
    traj = np.asarray(res.traj_quat)
    # static camera: positions should advance ~0.03/frame in x
    dx = np.diff(traj[:, 0])
    np.testing.assert_allclose(dx, 0.03, atol=0.012)
    np.testing.assert_allclose(np.diff(traj[:, 1]), 0.0, atol=0.012)
    # rotations ~ identity (translating object)
    assert np.abs(traj[:, 3:6]).max() < 0.1
    assert np.abs(traj[:, 6] - 1.0).max() < 0.02 or np.abs(traj[:, 6] + 1.0).max() < 0.02


def test_moving_camera_static_object(rng):
    """Ego-motion cancellation: a static object under camera translation
    must come out (near) stationary in the frame-0 coordinates."""
    res, frames, tracks = run(rng, cam_step=(0.04, 0, 0), obj_step=(0, 0, 0))
    assert bool(res.ok)
    traj = np.asarray(res.traj_quat)
    drift = np.linalg.norm(traj[1:, :3] - traj[0, :3], axis=1)
    assert drift.max() < 0.03, drift


def test_moving_camera_moving_object(rng):
    res, frames, tracks = run(rng, cam_step=(0.03, 0, 0), obj_step=(0.0, 0.025, 0))
    assert bool(res.ok)
    traj = np.asarray(res.traj_quat)
    dy = np.diff(traj[:, 1])
    np.testing.assert_allclose(dy, 0.025, atol=0.015)
    # x should stay ~constant (camera motion cancelled)
    assert np.abs(np.diff(traj[:, 0])).max() < 0.015


# ---------------------------------------------------------------------------
# Robustness under realistic input corruption (ROBUSTNESS.json holds the
# full degradation curve; these gates pin the supported envelope).
# Real inputs are dirty: DepthAnything depth is noisy/quantized with
# invalid regions (7_get_object_trajectory.py:112-124) and tracker
# pixels jitter and drop out (7_get:205-230).


def _run_perturbed(rng, frames, masks, tracks, t, robust=False):
    import dataclasses
    cfg = dataclasses.replace(small_cfg(), ratio_robust=robust)
    res = extract_trajectory(
        jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(tracks),
        jnp.asarray(t), F, PP, cfg=cfg,
        max_keypoints=1024, num_hypotheses=512, key=jax.random.PRNGKey(0),
    )
    return res


def _ade_rot(res, t, obj_step):
    traj = np.asarray(res.traj_quat)
    gt = traj[0, :3] + np.asarray(obj_step)[None] * np.arange(t)[:, None]
    ade = float(np.linalg.norm(traj[:, :3] - gt, axis=1).mean())
    rot = float(np.abs(traj[:, 3:6]).max())
    return ade, rot


def test_robustness_depth_noise_quant_holes(rng):
    """2% depth noise + 1 cm quantization + 5% holes (the DepthAnything
    regime) must stay within ~5x of the clean ADE and keep rotations
    near identity."""
    from egoscaler_tpu.pipelines.perturb import perturb_depth

    t = 4
    obj_step = (0.0, 0.025, 0.0)
    frames, masks, tracks = make_clip(rng, t, (0.03, 0, 0), obj_step)
    keep = np.round(tracks[..., :2]).astype(int)
    prng = np.random.default_rng(1)
    dirty = perturb_depth(
        frames, prng, noise_frac=0.02, quant_step=0.01, hole_frac=0.05,
        keep_px=keep,
    )
    res = _run_perturbed(rng, dirty, masks, tracks, t)
    assert bool(res.ok)
    ade, rot = _ade_rot(res, t, obj_step)
    assert ade < 0.05, f"ADE degraded beyond gate: {ade}"
    assert rot < 0.08, f"rotation degraded beyond gate: {rot}"


def test_robustness_depth_holes_heavy(rng):
    """15% invalid depth pixels: registration must shrug (holes only
    thin the cloud; get_points_colors drops them)."""
    from egoscaler_tpu.pipelines.perturb import perturb_depth

    t = 4
    obj_step = (0.0, 0.025, 0.0)
    frames, masks, tracks = make_clip(rng, t, (0.03, 0, 0), obj_step)
    keep = np.round(tracks[..., :2]).astype(int)
    dirty = perturb_depth(
        frames, np.random.default_rng(2), hole_frac=0.15, keep_px=keep
    )
    res = _run_perturbed(rng, dirty, masks, tracks, t)
    assert bool(res.ok)
    ade, rot = _ade_rot(res, t, obj_step)
    assert ade < 0.015, f"ADE under holes: {ade}"
    assert rot < 0.05


def test_robustness_track_jitter_and_dropout(rng):
    """0.5 px track jitter + 1% z noise + 25% dropout.  Mean depth-ratio
    (reference semantics) is scale-skewed by tracks slipping onto the
    background — bounded but visible; the robust median ratio
    (DataConfig.ratio_robust, beyond parity) must stay near clean."""
    from egoscaler_tpu.pipelines.perturb import perturb_tracks

    t = 4
    obj_step = (0.0, 0.025, 0.0)
    frames, masks, tracks = make_clip(rng, t, (0.03, 0, 0), obj_step)
    dirty = perturb_tracks(
        np.asarray(tracks), np.random.default_rng(3), jitter_px=0.5,
        jitter_z_frac=0.01, dropout_frac=0.25, frame_size=(W, H),
    )
    res_mean = _run_perturbed(rng, frames, masks, dirty, t)
    assert bool(res_mean.ok)
    ade_mean, _ = _ade_rot(res_mean, t, obj_step)
    assert ade_mean < 0.2, f"mean-ratio ADE beyond documented bound: {ade_mean}"

    res_med = _run_perturbed(rng, frames, masks, dirty, t, robust=True)
    assert bool(res_med.ok)
    ade_med, rot_med = _ade_rot(res_med, t, obj_step)
    assert ade_med < 0.05, f"median-ratio ADE: {ade_med}"
    assert ade_med <= ade_mean + 1e-6
    assert rot_med < 0.08


def test_validate_tracks_rejects_out_of_frame():
    t, q = 5, 10
    tracks = np.full((t, q, 3), 50.0, np.float32)
    tracks[2, :, 0] = 500.0  # whole frame out of range
    valid_q, ok = validate_tracks(jnp.asarray(tracks), W, H, jnp.asarray(t))
    assert not bool(ok)
    tracks[2, :, 0] = 50.0
    valid_q, ok = validate_tracks(jnp.asarray(tracks), W, H, jnp.asarray(t))
    assert bool(ok)
    assert np.asarray(valid_q).all()


def test_depth_noise_hardened_gate():
    """Round-4 hardening gate (VERDICT r3 item 5): at 5% multiplicative
    depth noise — the realistic monocular-metric-depth operating point —
    the hardened configuration (PCMConfig.adaptive_noise +
    fitness_floor + DataConfig.ratio_robust) keeps ADE under 0.03 m,
    where the parity configuration degrades to ~0.2 m."""
    import dataclasses

    from egoscaler_tpu.pipelines.perturb import perturb_depth

    t = 4
    obj_step = np.array([0.0, 0.025, 0.0])
    frames, masks, tracks = make_clip(
        np.random.default_rng(7), t, (0.03, 0, 0), tuple(obj_step)
    )
    noisy = perturb_depth(frames, np.random.default_rng(42), noise_frac=0.05)
    cfg = dataclasses.replace(
        small_cfg(), ratio_robust=True,
        pcm=dataclasses.replace(
            small_cfg().pcm, adaptive_noise=True, fitness_floor=0.25
        ),
    )
    res = extract_trajectory(
        jnp.asarray(noisy), jnp.asarray(masks), jnp.asarray(tracks),
        jnp.asarray(t), F, PP, cfg=cfg, max_keypoints=1024,
        num_hypotheses=512, key=jax.random.PRNGKey(0),
    )
    traj = np.asarray(res.traj_quat)
    gt = traj[0, :3] + obj_step[None] * np.arange(t)[:, None]
    ade = float(np.linalg.norm(traj[:, :3] - gt, axis=1).mean())
    rot = float(np.abs(np.asarray(res.traj_rotvec)[:, 3:]).max())
    assert bool(res.ok)
    assert ade < 0.03, f"hardened 5%-noise ADE {ade:.4f} >= 0.03"
    assert rot < 0.05, f"hardened 5%-noise rot_err {rot:.4f} >= 0.05"
