"""HOT3D hand mesh posing: UmeTrack and MANO linear-blend skinning.

Rebuilds the two vendored hand layers so the eval pipeline can pose full
hand meshes (not just wrist SE(3) + parameter vectors):

  * UmeTrack (reference ``umetrack_layer.py:20-229`` +
    ``UmeTrackHandDataProvider.py:29-190``): a 20-DoF per-finger
    kinematic chain (5 fingers x 4 DoF) producing 17 joint frames
    (root + wrist + 3 frames per finger), then LBS of landmarks /
    mesh vertices against per-point bone weights.  The hand profile is
    a plain JSON shipped with HOT3D clips — no licensed asset needed.
  * MANO (reference ``mano_layer.py:55-287`` via smplx): template +
    shape blendshapes + pose blendshapes + PCA-compressed articulation
    (15 coefficients), rigid FK over a 16-joint tree, LBS, fingertip
    vertex landmarks, and the HOT3D 21-landmark joint mapping.  The
    licensed MANO pickle is environment-gated; the math is exercised
    against schema-compatible synthetic assets (``ManoAsset.from_npz``).

Everything is host-side eval tooling -> pure numpy (float64, matching
the reference's ``.double()`` skinning path); no torch/smplx import.
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from egoscaler_tpu.data.eval.streams import Handedness, HandPose

MM_TO_M = 1e-3

# UmeTrack skeleton constants (umetrack_layer.py:20-21,
# UmeTrackHandDataProvider.py:142).
NUM_DIGITS = 5
DOF_PER_FINGER = 4
NUM_JOINT_FRAMES = 1 + 1 + 3 * NUM_DIGITS  # root + wrist + 3 frames x 5 fingers

# MANO constants (mano_layer.py:31-64).
MANO_NUM_VERTS = 778
MANO_NUM_LANDMARKS = 21
MANO_FINGERTIP_VERT_INDICES = {
    "thumb": 744,
    "index": 320,
    "middle": 443,
    "ring": 554,
    "pinky": 671,
}
# Reorders smplx's (16 FK joints + 5 fingertip verts) into HOT3D's
# 21-landmark order (mano_layer.py:31-52).
MANO_JOINT_MAPPING = [
    16, 17, 18, 19, 20, 0, 14, 15, 1, 2, 3, 4, 5, 6, 10, 11, 12, 7, 8, 9,
]


def axis_angle_to_matrix(axis_angle: np.ndarray) -> np.ndarray:
    """Batched Rodrigues (umetrack_layer.py:24-55), safe at theta -> 0
    (the reference divides by the norm; zero joint angles are valid
    inputs here, so guard the axis and rely on sin(0)=0, 1-cos(0)=0)."""
    aa = np.asarray(axis_angle, np.float64)
    theta = np.linalg.norm(aa, axis=-1)
    safe = np.where(theta > 1e-12, theta, 1.0)
    axis = aa / safe[..., None]

    c = np.cos(theta)
    s = np.sin(theta)
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    one_c = 1.0 - c
    o = np.stack(
        (
            c + kx * kx * one_c,
            kx * ky * one_c - kz * s,
            kx * kz * one_c + ky * s,
            kx * ky * one_c + kz * s,
            c + ky * ky * one_c,
            ky * kz * one_c - kx * s,
            kx * kz * one_c - ky * s,
            ky * kz * one_c + kx * s,
            c + kz * kz * one_c,
        ),
        axis=-1,
    )
    return o.reshape(*aa.shape[:-1], 3, 3)


def matrix_to_axis_angle(matrix: np.ndarray) -> np.ndarray:
    """Single 3x3 rotation -> axis-angle (pytorch3d rotation_conversions
    equivalent used by ManoHandDataProvider.py:66-68)."""
    m = np.asarray(matrix, np.float64)
    trace = np.clip((np.trace(m) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(trace)
    if theta < 1e-12:
        return np.zeros(3)
    if np.pi - theta < 1e-6:
        # Near-pi: extract axis from the symmetric part.
        a = np.sqrt(np.maximum(np.diag(m) + 1.0, 0.0) / 2.0)
        a *= np.sign(
            [m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]]
        ) + (np.sign([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]]) == 0)
        return a / max(np.linalg.norm(a), 1e-12) * theta
    axis = (
        np.array([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]])
        / (2.0 * np.sin(theta))
    )
    return axis * theta


# ---------------------------------------------------------------------------
# UmeTrack


@dataclasses.dataclass
class UmeTrackHandModel:
    """Hand profile schema (UmeTrackHandDataProvider.py:30-54), metric
    units (loader stores mm, ``from_dict`` converts to m)."""

    joint_rotation_axes: np.ndarray        # (20, 3)
    joint_rest_positions: np.ndarray       # (20, 3) [m]
    landmark_rest_positions: np.ndarray    # (L, 3) [m]
    landmark_rest_bone_weights: np.ndarray  # (L, K)
    landmark_rest_bone_indices: np.ndarray  # (L, K) int
    hand_scale: Optional[float] = None
    mesh_vertices: Optional[np.ndarray] = None       # (V, 3) [m]
    mesh_triangles: Optional[np.ndarray] = None      # (F, 3) int
    dense_bone_weights: Optional[np.ndarray] = None  # (V, 17)
    joint_limits: Optional[np.ndarray] = None


def umetrack_model_from_dict(j: Dict[str, Any]) -> UmeTrackHandModel:
    """mm -> m on positions/vertices (UmeTrackHandDataProvider.py:47-54)."""
    known = {f.name for f in dataclasses.fields(UmeTrackHandModel)}
    arrays = {k: np.asarray(v, np.float64) for k, v in j.items() if k in known}
    model = UmeTrackHandModel(**arrays)
    model.joint_rest_positions = model.joint_rest_positions * MM_TO_M
    model.landmark_rest_positions = model.landmark_rest_positions * MM_TO_M
    if model.mesh_vertices is not None:
        model.mesh_vertices = model.mesh_vertices * MM_TO_M
    if model.mesh_triangles is not None:
        model.mesh_triangles = model.mesh_triangles.astype(np.int64)
    model.landmark_rest_bone_indices = model.landmark_rest_bone_indices.astype(
        np.int64
    )
    return model


def load_umetrack_hand_model(filename: str) -> Optional[UmeTrackHandModel]:
    """__hand_profiles.json -> model (UmeTrackHandDataProvider.py:57-62)."""
    if not os.path.exists(filename):
        return None
    with open(filename, "rb") as f:
        d = json.load(f)
    if "hand_model" not in d:
        return None
    return umetrack_model_from_dict(d["hand_model"])


def dense_skinning_weights(
    bone_indices: np.ndarray, bone_weights: np.ndarray, n_frames: int
) -> np.ndarray:
    """Sparse (V, K) bone weights -> dense (V, n_frames) skin matrix
    (umetrack_layer.py:111-138).  Zero-weight entries stay zero even when
    their index collides with a real bone."""
    bone_indices = np.asarray(bone_indices)
    bone_weights = np.asarray(bone_weights, np.float64)
    lead = bone_indices.shape[:-2]
    v, k = bone_indices.shape[-2:]
    flat_idx = bone_indices.reshape(-1, v, k)
    flat_w = bone_weights.reshape(-1, v, k)
    out = np.zeros((flat_idx.shape[0], v, n_frames))
    b_ix = np.arange(flat_idx.shape[0])[:, None, None]
    v_ix = np.arange(v)[None, :, None]
    mask = flat_w != 0
    out[
        np.broadcast_to(b_ix, flat_idx.shape)[mask],
        np.broadcast_to(v_ix, flat_idx.shape)[mask],
        flat_idx[mask],
    ] = flat_w[mask]
    return out.reshape(*lead, v, n_frames)


def _joint_local_transforms(
    rotation_axis: np.ndarray, rest_pose: np.ndarray, joint_angles: np.ndarray
) -> np.ndarray:
    """Per-DoF local 4x4: rotate about the joint axis anchored at the
    rest position (umetrack_layer.py:76-94)."""
    angle_axis = rotation_axis * joint_angles[..., None]
    rot = axis_angle_to_matrix(angle_axis)
    trans = rest_pose - np.einsum("...ij,...j->...i", rot, rest_pose)
    out = np.zeros((*rot.shape[:-2], 4, 4))
    out[..., :3, :3] = rot
    out[..., :3, 3] = trans
    out[..., 3, 3] = 1.0
    return out


def hand_skinning_transforms(
    rotation_axis: np.ndarray,
    rest_poses: np.ndarray,
    joint_angles: np.ndarray,
    wrist_transforms: np.ndarray,
) -> np.ndarray:
    """(B, 20, ...) DoFs -> (B, 17, 4, 4) joint frames
    (umetrack_layer.py:141-168): frames 0-1 are root+wrist, then each
    finger contributes the composed frames after its 2nd, 3rd and 4th
    DoF (umetrack_layer.py:58-73 keeps ``transform_mats[2:]``)."""
    local = _joint_local_transforms(
        rotation_axis[:, :20], rest_poses[:, :20], joint_angles[:, :20]
    )  # (B, 20, 4, 4)
    frames = [wrist_transforms, wrist_transforms]
    for finger in range(NUM_DIGITS):
        chain = wrist_transforms
        per_finger = []
        for d in range(DOF_PER_FINGER):
            chain = chain @ local[:, finger * DOF_PER_FINGER + d]
            per_finger.append(chain)
        frames.extend(per_finger[1:])  # keep frames after DoF 2, 3, 4
    return np.stack(frames, axis=1)


def umetrack_skin_points(
    joint_rest_positions: np.ndarray,
    joint_rotation_axes: np.ndarray,
    skin_mat: np.ndarray,
    joint_angles: np.ndarray,
    points: np.ndarray,
    wrist_transforms: np.ndarray,
) -> np.ndarray:
    """LBS points through the FK frames (umetrack_layer.py:197-229):
    ``sum_k w[v,k] * (T_k @ [p_v; 1])``."""
    lead = np.asarray(joint_angles).shape[:-1]
    numel = int(np.prod(lead)) if lead else 1
    xfs = hand_skinning_transforms(
        np.asarray(joint_rotation_axes, np.float64).reshape(numel, -1, 3),
        np.asarray(joint_rest_positions, np.float64).reshape(numel, -1, 3),
        np.asarray(joint_angles, np.float64).reshape(numel, -1),
        np.asarray(wrist_transforms, np.float64).reshape(numel, 4, 4),
    )  # (B, 17, 4, 4)
    pts = np.asarray(points, np.float64).reshape(numel, -1, 3)
    homo = np.concatenate([pts, np.ones((*pts.shape[:-1], 1))], axis=-1)
    w = np.asarray(skin_mat, np.float64).reshape(numel, pts.shape[1], -1)
    # (B, 17, V, 4) frames applied to every point, weighted sum over frames.
    moved = np.einsum("bkij,bvj->bkvi", xfs, homo)
    skinned = np.einsum("bvk,bkvi->bvi", w, moved)[..., :3]
    return skinned.reshape(*lead, *skinned.shape[-2:]) if lead else skinned[0]


def umetrack_skin_landmarks(
    model: UmeTrackHandModel,
    joint_angles: np.ndarray,
    wrist_transforms: np.ndarray,
) -> np.ndarray:
    """21 posed landmarks (UmeTrackHandDataProvider.py:145-166)."""
    lead = np.asarray(joint_angles).shape[:-1]
    numel = int(np.prod(lead)) if lead else 1
    skin = dense_skinning_weights(
        np.broadcast_to(
            model.landmark_rest_bone_indices,
            (numel, *model.landmark_rest_bone_indices.shape),
        ),
        np.broadcast_to(
            model.landmark_rest_bone_weights,
            (numel, *model.landmark_rest_bone_weights.shape),
        ),
        NUM_JOINT_FRAMES,
    )
    return umetrack_skin_points(
        np.broadcast_to(model.joint_rest_positions, (numel, 20, 3)),
        np.broadcast_to(model.joint_rotation_axes, (numel, 20, 3)),
        skin,
        joint_angles,
        np.broadcast_to(
            model.landmark_rest_positions,
            (numel, *model.landmark_rest_positions.shape),
        ),
        wrist_transforms,
    )


def umetrack_skin_vertices(
    model: UmeTrackHandModel,
    joint_angles: np.ndarray,
    wrist_transforms: np.ndarray,
) -> np.ndarray:
    """Posed mesh vertices (UmeTrackHandDataProvider.py:168-190)."""
    if model.mesh_vertices is None or model.dense_bone_weights is None:
        raise ValueError("hand model has no mesh vertices / dense bone weights")
    lead = np.asarray(joint_angles).shape[:-1]
    numel = int(np.prod(lead)) if lead else 1
    return umetrack_skin_points(
        np.broadcast_to(model.joint_rest_positions, (numel, 20, 3)),
        np.broadcast_to(model.joint_rotation_axes, (numel, 20, 3)),
        np.broadcast_to(
            model.dense_bone_weights, (numel, *model.dense_bone_weights.shape)
        ),
        joint_angles,
        np.broadcast_to(
            model.mesh_vertices, (numel, *model.mesh_vertices.shape)
        ),
        wrist_transforms,
    )


# ---------------------------------------------------------------------------
# MANO


@dataclasses.dataclass
class ManoAsset:
    """One hand's MANO parameters (the smplx-visible subset of the
    licensed pickle; mano_layer.py:81-97 configures smplx with
    use_pca=True, num_pca_comps=15)."""

    v_template: np.ndarray        # (V, 3)
    shapedirs: np.ndarray         # (V, 3, S)
    posedirs: np.ndarray          # ((J-1)*9, V*3) pose-blend basis
    J_regressor: np.ndarray       # (J, V)
    weights: np.ndarray           # (V, J) LBS weights
    parents: np.ndarray           # (J,) kinematic tree, parents[0] < 0
    hands_components: np.ndarray  # (C, (J-1)*3) PCA basis
    hands_mean: np.ndarray        # ((J-1)*3,) mean articulation
    faces: Optional[np.ndarray] = None  # (F, 3)
    is_rhand: bool = True

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @staticmethod
    def from_npz(path: str, is_rhand: bool = True) -> "ManoAsset":
        """Schema-compatible synthetic assets for gate-free testing."""
        d = dict(np.load(path))
        faces = d.pop("faces", None)
        return ManoAsset(
            **{k: np.asarray(v, np.float64) for k, v in d.items()},
            faces=None if faces is None else faces.astype(np.int64),
            is_rhand=is_rhand,
        )


def _to_np(x: Any) -> np.ndarray:
    """chumpy arrays expose .r; plain arrays pass through."""
    return np.asarray(getattr(x, "r", x), np.float64)


def load_mano_pkl(path: str, is_rhand: bool) -> ManoAsset:
    """Load a licensed MANO_{LEFT,RIGHT}.pkl.  The pickle embeds chumpy
    objects; when chumpy is absent we substitute a shim class whose
    ``__setstate__`` keeps the raw dict (numpy arrays live under known
    keys).  Environment-gated: this host has no MANO asset, the loader
    is exercised only where the user provides one."""

    class _Shim:
        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict) else {})

        @property
        def r(self):
            for key in ("x", "a", "v"):
                if key in self.__dict__:
                    return np.asarray(self.__dict__[key])
            raise ValueError("cannot extract array from chumpy shim")

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("chumpy"):
                return _Shim
            return super().find_class(module, name)

    with open(path, "rb") as f:
        data = _Unpickler(f, encoding="latin1").load()
    posedirs = _to_np(data["posedirs"])
    v = _to_np(data["v_template"]).shape[0]
    if posedirs.ndim == 3:  # (V, 3, P) -> (P, V*3) like smplx
        posedirs = posedirs.reshape(v * 3, -1).T
    return ManoAsset(
        v_template=_to_np(data["v_template"]),
        shapedirs=_to_np(data["shapedirs"]),
        posedirs=posedirs,
        J_regressor=np.asarray(
            data["J_regressor"].todense()
            if hasattr(data["J_regressor"], "todense")
            else _to_np(data["J_regressor"])
        ),
        weights=_to_np(data["weights"]),
        parents=np.asarray(data["kintree_table"])[0].astype(np.int64),
        hands_components=_to_np(data["hands_components"]),
        hands_mean=_to_np(data["hands_mean"]),
        faces=np.asarray(data["f"]).astype(np.int64),
        is_rhand=is_rhand,
    )


def mano_forward(
    asset: ManoAsset,
    betas: np.ndarray,
    global_orient: np.ndarray,
    hand_pose: np.ndarray,
    transl: np.ndarray,
    use_pca: bool = True,
    flat_hand_mean: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """smplx MANO forward pass (the path mano_layer.py:135-157 invokes):
    shape blendshapes -> joint regression -> PCA articulation ->
    pose blendshapes -> rigid FK -> LBS -> translation.

    Args (batched over leading B):
      betas (B, S), global_orient (B, 3) axis-angle, hand_pose (B, C)
      PCA coefficients (or (B, (J-1)*3) full axis-angles when
      use_pca=False), transl (B, 3).
    Returns: vertices (B, V, 3), joints (B, J, 3).
    """
    betas = np.atleast_2d(np.asarray(betas, np.float64))
    global_orient = np.atleast_2d(np.asarray(global_orient, np.float64))
    hand_pose = np.atleast_2d(np.asarray(hand_pose, np.float64))
    transl = np.atleast_2d(np.asarray(transl, np.float64))
    b = hand_pose.shape[0]
    n_j = asset.num_joints

    # Shape blendshapes: v_shaped = T + shapedirs . betas
    v_shaped = asset.v_template[None] + np.einsum(
        "vks,bs->bvk", asset.shapedirs, betas
    )
    # Rest joints from the regressor.
    joints_rest = np.einsum("jv,bvk->bjk", asset.J_regressor, v_shaped)

    # Articulation: PCA coefficients -> full axis-angle vector.
    if use_pca:
        full_pose = hand_pose @ asset.hands_components[: hand_pose.shape[1]]
    else:
        full_pose = hand_pose
    if not flat_hand_mean:
        full_pose = full_pose + asset.hands_mean[None]
    aa = np.concatenate([global_orient, full_pose], axis=1).reshape(b, n_j, 3)
    rot_mats = axis_angle_to_matrix(aa)  # (B, J, 3, 3)

    # Pose blendshapes exclude the global orient.
    eye = np.eye(3)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(b, -1)  # (B, (J-1)*9)
    v_posed = v_shaped + (pose_feature @ asset.posedirs).reshape(b, -1, 3)

    # Rigid FK down the tree; then subtract the rest-pose-applied joint
    # so transforms act on rest-space points (standard LBS correction).
    rel = joints_rest.copy()
    rel[:, 1:] -= joints_rest[:, asset.parents[1:]]
    transforms = np.zeros((b, n_j, 4, 4))
    transforms[:, 0, :3, :3] = rot_mats[:, 0]
    transforms[:, 0, :3, 3] = rel[:, 0]
    transforms[:, 0, 3, 3] = 1.0
    for j in range(1, n_j):
        local = np.zeros((b, 4, 4))
        local[:, :3, :3] = rot_mats[:, j]
        local[:, :3, 3] = rel[:, j]
        local[:, 3, 3] = 1.0
        transforms[:, j] = transforms[:, asset.parents[j]] @ local
    posed_joints = transforms[:, :, :3, 3].copy()
    skin_tf = transforms.copy()
    skin_tf[:, :, :3, 3] -= np.einsum(
        "bjik,bjk->bji", transforms[:, :, :3, :3], joints_rest
    )

    # LBS.
    homo = np.concatenate([v_posed, np.ones((b, v_posed.shape[1], 1))], -1)
    blended = np.einsum("vj,bjik->bvik", asset.weights, skin_tf)
    verts = np.einsum("bvik,bvk->bvi", blended, homo)[..., :3]

    return verts + transl[:, None], posed_joints + transl[:, None]


class ManoHandModel:
    """Left+right MANO pair with HOT3D's landmark protocol
    (mano_layer.py:55-217): 15 PCA pose coefficients, 10 shape params,
    fingertip vertex landmarks appended to the FK joints, then the
    21-entry joint mapping.  Applies the left-hand shapedirs sign fix
    (mano_layer.py:99-109)."""

    N_LANDMARKS = MANO_NUM_LANDMARKS

    def __init__(self, left: ManoAsset, right: ManoAsset):
        self.left = left
        self.right = right
        self.num_pose_coeffs = 15
        self.num_shape_params = 10
        # smplx issue #48: broken assets ship the right hand's first
        # shape direction in the left pickle; flip when they match.
        if np.abs(left.shapedirs[:, 0, :] - right.shapedirs[:, 0, :]).sum() < 1:
            fixed = left.shapedirs.copy()
            fixed[:, 0, :] *= -1
            self.left = dataclasses.replace(left, shapedirs=fixed)

    @staticmethod
    def from_dir(mano_model_files_dir: str) -> Optional["ManoHandModel"]:
        """MANO_LEFT.pkl + MANO_RIGHT.pkl (mano_layer.py:71-97,281-287)."""
        lp = os.path.join(mano_model_files_dir, "MANO_LEFT.pkl")
        rp = os.path.join(mano_model_files_dir, "MANO_RIGHT.pkl")
        if not (os.path.exists(lp) and os.path.exists(rp)):
            return None
        return ManoHandModel(load_mano_pkl(lp, False), load_mano_pkl(rp, True))

    def forward_kinematics(
        self,
        shape_params: np.ndarray,
        joint_angles: np.ndarray,
        global_xform: np.ndarray,
        is_right_hand: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(mano_layer.py:111-217) global_xform rows are
        [axis-angle(3), transl(3)]; routes rows to the left/right asset,
        appends fingertip vertices when the FK joints alone don't reach
        21 landmarks, applies the joint mapping."""
        shape_params = np.asarray(shape_params, np.float64)
        joint_angles = np.asarray(joint_angles, np.float64)
        is_batched = joint_angles.ndim == 2
        joint_angles = np.atleast_2d(joint_angles)
        global_xform = np.atleast_2d(np.asarray(global_xform, np.float64))
        is_right = np.atleast_1d(np.asarray(is_right_hand, bool))
        n = joint_angles.shape[0]

        n_verts = self.left.v_template.shape[0]
        out_verts = np.zeros((n, n_verts, 3))
        # The reference asserts 21 raw landmarks (16 FK joints + 5
        # fingertip verts) then reorders through the 20-entry mapping
        # (mano_layer.py:208-211) — the mapped output has 20 rows.
        out_lm = np.zeros((n, len(MANO_JOINT_MAPPING), 3))
        for side, mask in ((self.left, ~is_right), (self.right, is_right)):
            if not mask.any():
                continue
            verts, joints = mano_forward(
                side,
                np.broadcast_to(shape_params, (int(mask.sum()), shape_params.shape[-1])),
                global_xform[mask, :3],
                joint_angles[mask],
                global_xform[mask, 3:],
            )
            if joints.shape[1] != self.N_LANDMARKS:
                tips = verts[:, list(MANO_FINGERTIP_VERT_INDICES.values())]
                joints = np.concatenate([joints, tips], axis=1)
            out_verts[mask] = verts
            out_lm[mask] = joints[:, MANO_JOINT_MAPPING]
        if not is_batched:
            return out_verts[0], out_lm[0]
        return out_verts, out_lm


# ---------------------------------------------------------------------------
# Mesh-posing providers (the Hand*DataProvider layer over streams.py poses)


def triangular_mesh_normals(
    vertices: np.ndarray, triangles: np.ndarray
) -> np.ndarray:
    """Area-weighted per-vertex normals (HandDataProviderBase.py:156-174)."""

    def _normed(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    norm = np.zeros_like(vertices)
    tris = vertices[triangles]
    n = _normed(np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]))
    np.add.at(norm, triangles[:, 0], n)
    np.add.at(norm, triangles[:, 1], n)
    np.add.at(norm, triangles[:, 2], n)
    return _normed(norm)


class UmeTrackHandMeshProvider:
    """Vertices/landmarks from a HandPose (UmeTrackHandDataProvider.py:
    66-139).  The profile is a LEFT hand; right hands flip the pose's X
    column."""

    def __init__(self, hand_model: Optional[UmeTrackHandModel]):
        self._hand_model = hand_model

    def _wrist_matrix(self, hand_pose: HandPose) -> np.ndarray:
        m = hand_pose.wrist_pose.matrix()
        if hand_pose.handedness == Handedness.Right:
            m = m.copy()
            m[:, 0] *= -1
        return m

    def get_hand_mesh_vertices(self, hand_pose: HandPose) -> Optional[np.ndarray]:
        if hand_pose.wrist_pose is None or self._hand_model is None:
            return None
        return umetrack_skin_vertices(
            self._hand_model,
            np.asarray(hand_pose.joint_angles, np.float64),
            self._wrist_matrix(hand_pose),
        )

    def get_hand_landmarks(self, hand_pose: HandPose) -> Optional[np.ndarray]:
        if hand_pose.wrist_pose is None or self._hand_model is None:
            return None
        return umetrack_skin_landmarks(
            self._hand_model,
            np.asarray(hand_pose.joint_angles, np.float64),
            self._wrist_matrix(hand_pose),
        )

    def get_hand_mesh_faces_and_normals(
        self, hand_pose: HandPose
    ) -> Optional[List[np.ndarray]]:
        if self._hand_model is None or self._hand_model.mesh_triangles is None:
            return None
        tris = self._hand_model.mesh_triangles
        verts = self.get_hand_mesh_vertices(hand_pose)
        if verts is None:
            return None
        return [tris, triangular_mesh_normals(verts, tris)]


class ManoHandMeshProvider:
    """Vertices/landmarks from a HandPose (ManoHandDataProvider.py:32-140):
    wrist SE(3) -> [axis-angle, transl] and per-sequence shape params."""

    def __init__(
        self,
        mano_model: Optional[ManoHandModel],
        shape_params: Optional[Sequence[float]],
    ):
        self.mano_model = mano_model
        self._shape = (
            None if shape_params is None else np.asarray(shape_params, np.float64)
        )

    def _global_xform(self, hand_pose: HandPose) -> np.ndarray:
        m = hand_pose.wrist_pose.matrix()
        return np.concatenate([matrix_to_axis_angle(m[:3, :3]), m[:3, 3]])

    def _fk(self, hand_pose: HandPose):
        if (
            hand_pose.wrist_pose is None
            or self._shape is None
            or self.mano_model is None
        ):
            return None
        return self.mano_model.forward_kinematics(
            self._shape,
            np.asarray(hand_pose.joint_angles, np.float64),
            self._global_xform(hand_pose),
            np.array([hand_pose.handedness == Handedness.Right]),
        )

    def get_hand_mesh_vertices(self, hand_pose: HandPose) -> Optional[np.ndarray]:
        out = self._fk(hand_pose)  # unbatched FK squeezes the outputs
        return None if out is None else out[0]

    def get_hand_landmarks(self, hand_pose: HandPose) -> Optional[np.ndarray]:
        out = self._fk(hand_pose)
        return None if out is None else out[1]

    def get_hand_mesh_faces_and_normals(
        self, hand_pose: HandPose
    ) -> Optional[List[np.ndarray]]:
        if self.mano_model is None:
            return None
        asset = (
            self.mano_model.right
            if hand_pose.handedness == Handedness.Right
            else self.mano_model.left
        )
        if asset.faces is None:
            return None
        verts = self.get_hand_mesh_vertices(hand_pose)
        if verts is None:
            return None
        return [asset.faces, triangular_mesh_normals(verts, asset.faces)]
