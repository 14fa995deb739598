"""HOT3D ground-truth trajectory math (eval stages 2 & 4).

Rebuild of egoscaler/data/eval/2_get_manipulated_object.py:94-113 and
4_get_object_trajectory.py:80-236 on the numpy pose providers:

* manipulated object = the dynamic object with the largest total travel
  distance over the segment; rejected when every object moves < 10 cm;
* GT 6DoF trajectory: world -> device -> camera transform chain, CAD-mesh
  bbox-center correction (poses anchor the mesh bottom-center), and the
  pseudo-depth ratio aligning metric GT to the monocular depth scale.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from egoscaler_tpu.data.eval.providers import (
    Hot3dDataProvider,
    ObjectLibrary,
    Pose3d,
)
from egoscaler_tpu.geometry.rotations import quat_from_matrix

MIN_TRAVEL_M = 0.10  # 10 cm rejection threshold (2_get:94-113)


def select_manipulated_object(
    provider: Hot3dDataProvider,
    start_ns: int,
    end_ns: int,
) -> Optional[str]:
    """Object uid with max travel distance in [start, end], or None."""
    best_uid, best_dist = None, 0.0
    for uid in provider.object_pose_data_provider.object_uids:
        ts, pos = provider.object_pose_data_provider.trajectory(uid)
        sel = (ts >= start_ns) & (ts <= end_ns)
        p = pos[sel]
        if len(p) < 2:
            continue
        dist = float(np.sum(np.linalg.norm(np.diff(p, axis=0), axis=1)))
        if dist > best_dist:
            best_uid, best_dist = uid, dist
    if best_dist < MIN_TRAVEL_M:
        return None
    return best_uid


@dataclasses.dataclass
class CameraExtrinsics:
    """Device-from-camera transform (the reference's R_intri/T_intri from
    the Aria calibration, with the cw90 image rotation folded in)."""

    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(3)
    )
    translation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )


def extract_gt_trajectory(
    provider: Hot3dDataProvider,
    object_uid: str,
    timestamps_ns: np.ndarray,
    bbox_min_max: Optional[np.ndarray] = None,
    camera: CameraExtrinsics = CameraExtrinsics(),
    depth_at_projection=None,
    focal_len: float = 605.343,
    principal_point: float = 703.5,
) -> Optional[Dict[str, np.ndarray]]:
    """GT 6DoF trajectory in camera coords (eval 4_get:115-236).

    `bbox_min_max`: (2, 3) CAD bbox (mm scale, as in the object library);
    `depth_at_projection(u, v)` optionally returns the monocular depth at
    the frame-0 projection for the pseudo-depth ratio (4_get:175-204);
    without it the trajectory stays in metric GT scale (ratio = 1).
    Returns {init_bbox (8,3), traj_quat (T,7), traj_rotvec (T,6)} or None.
    """
    if bbox_min_max is None:
        bbox_min_max = np.array([[-50.0, -50.0, -50.0], [50.0, 50.0, 50.0]])
    # mesh is mm; world is m (4_get:195-197)
    bmin, bmax = bbox_min_max * 1e-3
    corners = np.array(
        [
            [x, y, z]
            for x in (bmin[0], bmax[0])
            for y in (bmin[1], bmax[1])
            for z in (bmin[2], bmax[2])
        ]
    )
    bbox_center = corners.mean(axis=0)

    traj = []
    ratio_depth = 1.0
    for i, ns in enumerate(timestamps_ns):
        dev = provider.device_pose_data_provider.get_pose_at_timestamp(int(ns))
        objs = provider.object_pose_data_provider.get_pose_at_timestamp(int(ns))
        if dev is None or objs is None:
            return None
        device_pose, _ = dev
        collection, _ = objs
        if object_uid not in collection:
            return None  # object fully occluded (4_get:141-144)
        obj_pose = collection[object_uid]

        # bbox-center correction: poses anchor the mesh bottom center
        world_obj_coord = obj_pose.translation + obj_pose.rotation @ bbox_center
        # world -> device
        dev_coord = device_pose.rotation.T @ (
            world_obj_coord - device_pose.translation
        )
        dev_rot = device_pose.rotation.T @ obj_pose.rotation
        # device -> camera
        cam_coord = camera.rotation.T @ (dev_coord - camera.translation)
        cam_rot = camera.rotation.T @ dev_rot

        if i == 0 and depth_at_projection is not None:
            u = focal_len * cam_coord[0] / cam_coord[2] + principal_point
            v = focal_len * cam_coord[1] / cam_coord[2] + principal_point
            d = depth_at_projection(u, v)
            if d is None:
                return None  # out of frame (4_get:185-189)
            ratio_depth = float(d) / float(cam_coord[2])

        quat = np.asarray(
            quat_from_matrix(cam_rot.astype(np.float32))
        )
        traj.append(
            np.concatenate([cam_coord * ratio_depth, quat]).astype(np.float32)
        )

    traj_quat = np.stack(traj)
    init_bbox = corners * ratio_depth
    init_bbox = init_bbox - init_bbox.mean(axis=0)

    from egoscaler_tpu.geometry.rotations import rotvec_from_quat
    import jax.numpy as jnp

    rotvec = np.asarray(rotvec_from_quat(jnp.asarray(traj_quat[:, 3:7])))
    traj_rotvec = np.concatenate([traj_quat[:, :3], rotvec], axis=1)
    return {
        "init_bbox": init_bbox.astype(np.float32),
        "traj_quat": traj_quat,
        "traj_rotvec": traj_rotvec.astype(np.float32),
    }


def segment_timestamps(
    start_ns: int, end_ns: int, fps: float = 20.0
) -> np.ndarray:
    """4-second segment frame timestamps (eval 4_get:92-93)."""
    return np.arange(start_ns, end_ns, int(1e9 / fps)).astype(np.int64)
