"""Data-pipeline thresholds (reference: egoscaler/configs/data.py:1-7)."""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PCMConfig:
    """Point-cloud matching (registration) parameters."""

    voxel_size: float = 0.1  # meters; FPFH radius = 5x, normal radius = 2x
    normal_max_nn: int = 30
    fpfh_max_nn: int = 100
    ransac_max_iters: int = 100_000
    ransac_confidence: float = 0.999
    icp_max_iters: int = 30
    icp_relative_fitness: float = 1e-6
    icp_relative_rmse: float = 1e-6
    # distance thresholds expressed as multiples of voxel_size
    ransac_distance_mult: float = 1.5
    icp_distance_mult: float = 0.4
    edge_length_check: float = 0.9
    # ---- beyond-parity robustness knobs (ROBUSTNESS.json) ----
    # Estimate per-frame depth noise (median |adjacent-pixel depth
    # diff|) and widen the RANSAC/ICP inlier thresholds by
    # sigma / (0.25 * voxel), clipped to [1, 4]: at DepthAnything-like
    # >=5% metric error the jitter (~0.1 m at 2 m) rivals the voxel
    # size, so the parity thresholds reject the (zero-mean) inliers the
    # LSQ fit needs to average the noise out.
    adaptive_noise: bool = False
    # Identity fallback for a pair whose post-ICP fitness falls below
    # this floor: one blown-up pair otherwise corrupts every later
    # frame of the chained trajectory.  The reference's analogue drops
    # the whole clip when colored ICP throws (pcm_tools.py:49-64 +
    # 7_get_object_trajectory.py:278-282); identity degrades gracefully
    # instead (inter-frame ego-motion is small).  0.0 = parity off.
    fitness_floor: float = 0.0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Detection / depth thresholds used by the trajectory pipeline."""

    mani_obj_det_threshold: float = 0.3
    depth_threshold: float = 5.0  # meters; points beyond are dropped
    # Track depth-ratio aggregation: the reference means depth[y,x]/z
    # over all tracked pixels (7_get_object_trajectory.py:224), so one
    # jittered track that slips onto the background (depth 2 m vs object
    # 1.2 m) skews the scale of the whole waypoint.  True = masked
    # median instead (beyond-parity robustness; measured in
    # ROBUSTNESS.json: 0.5 px jitter ADE 0.111 -> ~0.01).
    ratio_robust: bool = False
    pcm: PCMConfig = dataclasses.field(default_factory=PCMConfig)
