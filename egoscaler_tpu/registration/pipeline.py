"""Full frame-pair registration: the ego-motion-cancellation chain.

One jittable function reproducing pcm_tools.py's prepare_dataset ->
execute_global_registration -> refine_registration sequence
(7_get_object_trajectory.py:258-282): voxel downsample + normals + FPFH
on both clouds, mutual feature matching, RANSAC, colored-ICP refine.
Everything is fixed-shape so `jax.vmap`/`lax.scan` can run a whole clip's
frame pairs in a single compiled program on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import PCMConfig
from egoscaler_tpu.registration.fpfh import compute_fpfh
from egoscaler_tpu.registration.icp import ICPResult, colored_icp
from egoscaler_tpu.registration.normals import estimate_normals
from egoscaler_tpu.registration.ransac import (
    match_features,
    ransac_registration,
)
from egoscaler_tpu.registration.voxel import (
    voxel_downsample,
    voxel_downsample_hash,
)


class RegistrationResult(NamedTuple):
    transformation: jax.Array  # (4, 4) source -> target
    fitness: jax.Array
    inlier_rmse: jax.Array


def prepare_cloud(
    points: jax.Array,
    colors: jax.Array,
    mask: jax.Array,
    cfg: PCMConfig = PCMConfig(),
    max_keypoints: int = 4096,
    voxel_method: str = "sort",
    return_neighbors: bool = False,
):
    """prepare_dataset equivalent (pcm_tools.py:25-28): keypoints via
    voxel downsample, normals (radius 2*voxel), FPFH (radius 5*voxel).

    voxel_method "sort" (default) is the exact run-length
    implementation; "hash" is a sort-free scatter variant (measured
    SLOWER on v5e-lite: XLA lowers the 2^20-segment scatter worse than
    the sort — 1.52 vs 2.04 clips/s — kept for architectures where
    scatter wins)."""
    downsample = (
        voxel_downsample_hash if voxel_method == "hash" else voxel_downsample
    )
    pts, cols, m = downsample(
        points, colors, mask, cfg.voxel_size, max_keypoints
    )
    # ONE self-inclusive kNN table serves both consumers (ascending, so
    # the first normal_max_nn columns radius-masked at 2*voxel equal the
    # normals' own hybrid search, and columns 1..fpfh_max_nn radius-
    # masked at 5*voxel equal FPFH's self-exclusive search) — the M x M
    # distance pass + sort was the dominant prep cost, done twice before.
    from egoscaler_tpu.registration.neighbors import knn_table

    k = max(cfg.fpfh_max_nn + 1, cfg.normal_max_nn)
    neighbors = knn_table(pts, m, k, include_self=True)
    normals = estimate_normals(
        pts, m, radius=cfg.voxel_size * 2.0, max_nn=cfg.normal_max_nn,
        neighbors=neighbors,
    )
    fpfh = compute_fpfh(
        pts, normals, m, radius=cfg.voxel_size * 5.0, max_nn=cfg.fpfh_max_nn,
        neighbors=neighbors,
    )
    if return_neighbors:
        # the same table serves colored ICP's color-gradient search
        # (k >= 30 + 1 self column; see color_gradients)
        return pts, cols, normals, fpfh, m, neighbors
    return pts, cols, normals, fpfh, m


def register_pair(
    source_points: jax.Array,
    source_colors: jax.Array,
    source_mask: jax.Array,
    target_points: jax.Array,
    target_colors: jax.Array,
    target_mask: jax.Array,
    cfg: PCMConfig = PCMConfig(),
    max_keypoints: int = 4096,
    num_hypotheses: int = 4096,
    key: Optional[jax.Array] = None,
) -> RegistrationResult:
    """Full chain on raw (masked) clouds -> source->target SE(3)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    sp, sc, sn, sf, sm = prepare_cloud(
        source_points, source_colors, source_mask, cfg, max_keypoints
    )
    tp, tc, tn, tf, tm, tnb = prepare_cloud(
        target_points, target_colors, target_mask, cfg, max_keypoints,
        return_neighbors=True,
    )

    corr, corr_valid = match_features(sf, sm, tf, tm)
    ransac = ransac_registration(
        sp, tp, corr, corr_valid,
        distance_threshold=cfg.voxel_size * cfg.ransac_distance_mult,
        num_hypotheses=num_hypotheses,
        edge_length_check=cfg.edge_length_check,
        key=key,
    )
    icp = colored_icp(
        sp, sc, sm, tp, tc, tn, tm,
        init_transform=ransac.transformation,
        distance_threshold=cfg.voxel_size * cfg.icp_distance_mult,
        gradient_radius=cfg.voxel_size * 2.0,
        max_iterations=cfg.icp_max_iters,
        target_neighbors=tnb,
    )
    return RegistrationResult(icp.transformation, icp.fitness, icp.inlier_rmse)
