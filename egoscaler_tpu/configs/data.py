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
