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
    pcm: PCMConfig = dataclasses.field(default_factory=PCMConfig)
