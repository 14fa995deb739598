"""Pure-JAX geometry core.

Layer L1 of the rebuild: camera back-projection, SE(3)/rotation
conversions, Kabsch alignment, oriented bounding boxes, trajectory
resampling/smoothing.  Every function is jittable, vmappable, and operates
on fixed-shape (optionally masked) arrays so the whole clip->trajectory
path compiles into one XLA program.

Reference surface: egoscaler/data/tools/pcm_tools.py,
egoscaler/models/utils/traj_utils.py.
"""
from .rotations import (
    quat_from_matrix,
    matrix_from_quat,
    rotvec_from_matrix,
    matrix_from_rotvec,
    quat_from_rotvec,
    rotvec_from_quat,
    quat_multiply,
    quat_geodesic_distance,
)
from .camera import (
    backproject_depth,
    backproject_points,
    project_points,
    get_points_colors,
)
from .kabsch import kabsch_rotation, kabsch_se3
from .obb import statistical_outlier_mask, oriented_bounding_box, minimum_3dbox
from .traj import preprocess_traj, smoothing_traj
from .transforms import (
    se3_from_rt,
    se3_apply,
    se3_compose,
    se3_inverse,
)

__all__ = [
    "quat_from_matrix",
    "matrix_from_quat",
    "rotvec_from_matrix",
    "matrix_from_rotvec",
    "quat_from_rotvec",
    "rotvec_from_quat",
    "quat_multiply",
    "quat_geodesic_distance",
    "backproject_depth",
    "backproject_points",
    "project_points",
    "get_points_colors",
    "kabsch_rotation",
    "kabsch_se3",
    "statistical_outlier_mask",
    "oriented_bounding_box",
    "minimum_3dbox",
    "preprocess_traj",
    "smoothing_traj",
    "se3_from_rt",
    "se3_apply",
    "se3_compose",
    "se3_inverse",
]
