"""Clip -> 6DoF object trajectory: the core extraction algorithm.

TPU-native rebuild of 7_get_object_trajectory.py:180-328 (the heaviest
pipeline stage, SURVEY.md §3.3).  The reference runs a python loop with
Open3D calls per frame; here the whole clip compiles into ONE XLA
program:

  1. per-frame background clouds (bbox-masked, d < 5 m back-projection,
     pcm_tools.py:68-96) -> prepare_cloud (voxel/normals/FPFH) under
     lax.map;
  2. consecutive-frame registration (RANSAC + colored ICP) under
     lax.map over pair indices — every pair registered in parallel
     semantics, no python loop (7_get:258-282);
  3. transform chaining M_1 @ ... @ M_t via lax.associative_scan
     (7_get:286-295);
  4. per-frame track back-projection, depth-ratio scale, Kabsch rotation
     vs frame 0, quaternion conversion (7_get:220-303).

Dynamic clip lengths are handled with a `num_frames` mask over the
padded T_max axis — same results, static shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import DataConfig
from egoscaler_tpu.geometry.camera import backproject_points, get_points_colors
from egoscaler_tpu.geometry.kabsch import kabsch_rotation
from egoscaler_tpu.geometry.obb import minimum_3dbox
from egoscaler_tpu.geometry.rotations import quat_from_matrix, rotvec_from_quat
from egoscaler_tpu.geometry.transforms import se3_apply
from egoscaler_tpu.registration.pipeline import prepare_cloud
from egoscaler_tpu.registration.icp import colored_icp
from egoscaler_tpu.registration.ransac import match_features, ransac_registration


class TrajectoryResult(NamedTuple):
    init_bbox: jax.Array     # (8, 3) OBB corners, centered
    traj_quat: jax.Array     # (T, 7) xyz + xyzw quaternion
    traj_rotvec: jax.Array   # (T, 6) xyz + rotvec
    frame_valid: jax.Array   # (T,) True for frames < num_frames
    ok: jax.Array            # scalar bool: extraction succeeded


def validate_tracks(
    tracks: jax.Array, width: int, height: int, num_frames: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """7_get:205-214: tracks (T, Q, 3) (x, y, z) -> (per-query valid
    across all frames, clip ok flag)."""
    xs = jnp.round(tracks[..., 0]).astype(jnp.int32)
    ys = jnp.round(tracks[..., 1]).astype(jnp.int32)
    inside = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    t_max = tracks.shape[0]
    frame_on = jnp.arange(t_max) < num_frames
    inside = inside | ~frame_on[:, None]  # padded frames don't count
    # frame valid if >= half of frame-0's in-frame queries remain inside
    n0 = jnp.sum(inside[0])
    frames_ok = jnp.sum(inside, axis=1) >= n0 / 2
    ok = jnp.all(frames_ok | ~frame_on)
    valid_q = jnp.all(inside, axis=0)
    return valid_q, ok


def extract_trajectory(
    rgbd_seq: jax.Array,       # (T, H, W, 4) rgb + metric depth
    bbox_masks: jax.Array,     # (T, H, W) True = excluded (moving objects)
    tracks: jax.Array,         # (T, Q, 3) tracker output (x px, y px, z m)
    num_frames: jax.Array,     # scalar int: valid frames <= T
    focal_len: float,
    principal_point: float,
    cfg: DataConfig = DataConfig(),
    max_keypoints: int = 4096,
    num_hypotheses: int = 4096,
    key: Optional[jax.Array] = None,
    map_batch: int = 1,
    cloud_stride: int = 1,
) -> TrajectoryResult:
    """`map_batch` > 1 vmaps that many frames/pairs at a time through the
    per-frame/per-pair stages.  Measured on v5e-lite: serial (1) wins —
    the batched 4096^2 distance/top_k buffers overflow VMEM and thrash
    HBM (0.19 clips/s at batch 4 vs 1.12 serial).  Kept as a knob for
    chips with more VMEM.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    t_max, h, w, _ = rgbd_seq.shape
    q = tracks.shape[1]

    valid_q, tracks_ok = validate_tracks(tracks, w, h, num_frames)

    # ---- per-frame track back-projection + depth-ratio (7_get:220-230) --
    xs = jnp.clip(jnp.round(tracks[..., 0]).astype(jnp.int32), 0, w - 1)
    ys = jnp.clip(jnp.round(tracks[..., 1]).astype(jnp.int32), 0, h - 1)
    zs = tracks[..., 2]
    depth_maps = rgbd_seq[..., 3]
    frame_idx = jnp.arange(t_max)[:, None]
    d_at = depth_maps[frame_idx, ys, xs]  # (T, Q)
    wq = valid_q.astype(jnp.float32)[None, :]
    ratios = d_at / jnp.maximum(zs, 1e-6)  # (T, Q)
    if cfg.ratio_robust:
        # Masked lower median: immune to tracks that jitter onto the
        # background (cfg.ratio_robust doc; the reference means all).
        big = jnp.where(valid_q[None, :], ratios, jnp.inf)
        srt = jnp.sort(big, axis=1)
        cnt = jnp.sum(valid_q).astype(jnp.int32)
        ratio_depth = srt[:, jnp.maximum(cnt - 1, 0) // 2]  # (T,)
        # Temporal median-of-3: the ratio corrects slow metric-scale
        # drift between tracker z and measured depth, so frame-to-frame
        # it is smooth; under noisy depth the per-frame median is
        # jitter that multiplies STRAIGHT into the waypoint position
        # (pos * ratio_depth[t] below).  Edge frames clamp.
        prev = jnp.concatenate([ratio_depth[:1], ratio_depth[:-1]])
        nxt = jnp.concatenate([ratio_depth[1:], ratio_depth[-1:]])
        trip = jnp.stack([prev, ratio_depth, nxt], axis=0)
        ratio_depth = jnp.median(trip, axis=0)
    else:
        ratio_depth = jnp.sum(ratios * wq, axis=1) / (
            jnp.sum(wq, axis=1).clip(1.0)
        )  # (T,)
    uv = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=-1)
    object_coords = backproject_points(
        uv, zs, focal_len, focal_len, principal_point
    )  # (T, Q, 3)

    # ---- per-frame background clouds + keypoints (7_get:244-261) -------
    # `cloud_stride` decimates pixels feeding the REGISTRATION cloud only
    # (tracks stay full-res): at voxel 0.1 m the grid averages ~10^2+
    # pixels per cell at 1408^2, so stride-2/4 decimation changes voxel
    # means negligibly while cutting the dominant 2M-point sort 4-16x.
    def prep(frame_and_mask):
        rgbd, bmask = frame_and_mask
        if cfg.pcm.adaptive_noise:
            # 3x3 median prefilter on the REGISTRATION depth only:
            # kills per-pixel zero-mean noise ~3x before voxelization
            # (the track depth-ratio path stays parity-exact).  Real
            # monocular-depth error is low-frequency, so on clean
            # inputs this is a no-op within voxel averaging.
            d = rgbd[..., 3]
            dpad = jnp.pad(d, 1, mode="edge")
            shifts = jnp.stack([
                dpad[di:di + d.shape[0], dj:dj + d.shape[1]]
                for di in range(3) for dj in range(3)
            ])
            dmed = jnp.median(shifts, axis=0)
            # holes (depth 0) stay holes
            dmed = jnp.where(d > 0.0, dmed, 0.0)
            rgbd = jnp.concatenate([rgbd[..., :3], dmed[..., None]], -1)
        if cloud_stride > 1:
            rgbd = rgbd[::cloud_stride, ::cloud_stride]
            bmask = bmask[::cloud_stride, ::cloud_stride]
        pts, cols, valid = get_points_colors(
            rgbd, focal_len / cloud_stride, focal_len / cloud_stride,
            principal_point / cloud_stride,
            bbox_mask=bmask, d_thres=cfg.depth_threshold,
        )
        return prepare_cloud(
            pts, cols, valid, cfg.pcm, max_keypoints, return_neighbors=True
        )

    bs = None if map_batch <= 1 else min(map_batch, t_max)
    clouds = jax.lax.map(prep, (rgbd_seq, bbox_masks), batch_size=bs)
    kp_pts, kp_cols, kp_normals, kp_fpfh, kp_mask, (kp_nb_idx, kp_nb_d2) = clouds

    # ---- per-frame depth-noise estimate (beyond parity; see
    # PCMConfig.adaptive_noise).  Median |adjacent-pixel depth diff| on
    # a 4x-strided grid: zero-mean multiplicative noise of fraction f at
    # depth d gives ~0.95 * f * d here, while a clean surface's slope
    # contributes millimeters; depth discontinuities are a minority the
    # median ignores.
    if cfg.pcm.adaptive_noise:
        d4 = depth_maps[:, ::4, ::4]
        dd = jnp.abs(d4[:, :, 1:] - d4[:, :, :-1])
        ok2 = (d4[:, :, 1:] > 0.0) & (d4[:, :, :-1] > 0.0)
        flat = jnp.where(ok2, dd, jnp.inf).reshape(t_max, -1)
        srt = jnp.sort(flat, axis=1)
        cnt = jnp.sum(ok2.reshape(t_max, -1), axis=1).astype(jnp.int32)
        sigma = jnp.take_along_axis(
            srt, (jnp.maximum(cnt, 1) - 1)[:, None] // 2, axis=1
        )[:, 0]
        noise_scale = jnp.clip(
            sigma / (0.25 * cfg.pcm.voxel_size), 1.0, 4.0
        )
    else:
        noise_scale = jnp.ones((t_max,), jnp.float32)

    # ---- consecutive-pair registration (7_get:258-282) -----------------
    def register(i):
        # source = frame i+1, target = frame i
        sp, sc, sn, sf, sm = (
            kp_pts[i + 1], kp_cols[i + 1], kp_normals[i + 1],
            kp_fpfh[i + 1], kp_mask[i + 1],
        )
        tp, tc, tn, tf, tm = (
            kp_pts[i], kp_cols[i], kp_normals[i], kp_fpfh[i], kp_mask[i],
        )
        corr, cval = match_features(sf, sm, tf, tm)
        pair_scale = 0.5 * (noise_scale[i] + noise_scale[i + 1])
        ransac = ransac_registration(
            sp, tp, corr, cval,
            distance_threshold=cfg.pcm.voxel_size
            * cfg.pcm.ransac_distance_mult * pair_scale,
            num_hypotheses=num_hypotheses,
            edge_length_check=cfg.pcm.edge_length_check,
            key=jax.random.fold_in(key, i),
        )
        icp = colored_icp(
            sp, sc, sm, tp, tc, tn, tm,
            init_transform=ransac.transformation,
            distance_threshold=cfg.pcm.voxel_size
            * cfg.pcm.icp_distance_mult * pair_scale,
            gradient_radius=cfg.pcm.voxel_size * 2.0,
            max_iterations=cfg.pcm.icp_max_iters,
            target_neighbors=(kp_nb_idx[i], kp_nb_d2[i]),
        )
        tf_out = icp.transformation
        if cfg.pcm.fitness_floor > 0.0:
            # graceful per-pair identity fallback (PCMConfig doc)
            tf_out = jnp.where(
                icp.fitness >= cfg.pcm.fitness_floor, tf_out, jnp.eye(4)
            )
        return tf_out, icp.fitness

    pair_bs = None if map_batch <= 1 else min(map_batch, t_max - 1)
    pair_tf, pair_fit = jax.lax.map(
        register, jnp.arange(t_max - 1), batch_size=pair_bs
    )
    # frames beyond num_frames: identity (no effect on chain)
    pair_on = (jnp.arange(t_max - 1) + 1) < num_frames
    eye = jnp.broadcast_to(jnp.eye(4), pair_tf.shape)
    pair_tf = jnp.where(pair_on[:, None, None], pair_tf, eye)

    # ---- chain: T_t = M_1 @ M_2 @ ... @ M_t (7_get:286-295) ------------
    chained = jax.lax.associative_scan(
        lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST),
        pair_tf,
        axis=0,
    )  # chained[i] = M_1 @ ... @ M_{i+1}
    chain_full = jnp.concatenate(
        [jnp.eye(4)[None], chained], axis=0
    )  # (T, 4, 4); chain_full[t] maps frame t -> frame 0

    # ---- init frame geometry (7_get:232-241) ---------------------------
    init_coords_all = object_coords[0]
    init_bbox, bbox_ok = minimum_3dbox(init_coords_all, valid_q)

    # ---- per-frame pose (7_get:286-303) --------------------------------
    projected = se3_apply(chain_full, object_coords)  # (T, Q, 3)

    def frame_pose(t):
        rot = kabsch_rotation(init_coords_all, projected[t], valid_q)
        rot = jnp.where(t == 0, jnp.eye(3), rot)
        wv = valid_q.astype(jnp.float32)
        pos = jnp.sum(projected[t] * wv[:, None], axis=0) / jnp.sum(wv).clip(1.0)
        pos = pos * ratio_depth[t]
        quat = quat_from_matrix(rot)
        return jnp.concatenate([pos, quat])

    traj_quat = jax.vmap(frame_pose)(jnp.arange(t_max))  # (T, 7)
    rotvec = rotvec_from_quat(traj_quat[:, 3:7])
    traj_rotvec = jnp.concatenate([traj_quat[:, :3], rotvec], axis=-1)

    init_bbox_centered = init_bbox - jnp.mean(init_bbox, axis=0)
    frame_valid = jnp.arange(t_max) < num_frames
    # registration health: all in-range pairs must have found inliers
    regist_ok = jnp.all(jnp.where(pair_on, pair_fit > 0.0, True))
    ok = tracks_ok & bbox_ok & regist_ok

    return TrajectoryResult(
        init_bbox=init_bbox_centered,
        traj_quat=traj_quat,
        traj_rotvec=traj_rotvec,
        frame_valid=frame_valid,
        ok=ok,
    )
