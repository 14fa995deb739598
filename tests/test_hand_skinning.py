"""MANO / UmeTrack LBS skinning vs plain-loop numpy oracles.

The licensed MANO pickle and the HOT3D hand profiles are absent from
this host, so every test builds a schema-compatible synthetic asset and
checks the vectorized layers against direct per-joint / per-vertex loop
implementations of the reference semantics (umetrack_layer.py:58-229,
mano_layer.py:111-217 via smplx's MANO forward)."""
import json
import pickle

import numpy as np
import pytest

from egoscaler_tpu.data.eval.hand_skinning import (
    ManoAsset,
    ManoHandMeshProvider,
    ManoHandModel,
    UmeTrackHandMeshProvider,
    UmeTrackHandModel,
    axis_angle_to_matrix,
    dense_skinning_weights,
    load_mano_pkl,
    load_umetrack_hand_model,
    mano_forward,
    matrix_to_axis_angle,
    triangular_mesh_normals,
    umetrack_model_from_dict,
    umetrack_skin_landmarks,
    umetrack_skin_points,
    umetrack_skin_vertices,
    MANO_FINGERTIP_VERT_INDICES,
    MANO_JOINT_MAPPING,
    NUM_JOINT_FRAMES,
)
from egoscaler_tpu.data.eval.providers import Pose3d
from egoscaler_tpu.data.eval.streams import Handedness, HandPose


def random_rotation(rng) -> np.ndarray:
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def random_se3(rng) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = random_rotation(rng)
    m[:3, 3] = rng.normal(size=3) * 0.2
    return m


# ---------------------------------------------------------------------------
# UmeTrack


def make_umetrack_model(rng, with_mesh=True) -> UmeTrackHandModel:
    axes = rng.normal(size=(20, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    n_lm, k = 21, 4
    # Unique bone indices per landmark (duplicates would make the
    # reference's assignment-scatter drop weight mass).
    lm_idx = np.stack(
        [rng.choice(NUM_JOINT_FRAMES, size=k, replace=False) for _ in range(n_lm)]
    )
    lm_w = rng.uniform(0.1, 1.0, size=(n_lm, k))
    lm_w[rng.uniform(size=(n_lm, k)) < 0.25] = 0.0  # exercise sparse zeros
    lm_w[:, 0] += 0.1  # keep each row non-empty
    lm_w /= lm_w.sum(-1, keepdims=True)
    v = 40
    dense = rng.uniform(0.0, 1.0, size=(v, NUM_JOINT_FRAMES))
    dense /= dense.sum(-1, keepdims=True)
    # Non-degenerate triangles covering every vertex (so every vertex
    # normal is well-defined in the provider test).
    ar = np.arange(v)
    tri = np.stack([ar, (ar + 1) % v, (ar + 2) % v], axis=1)
    return UmeTrackHandModel(
        joint_rotation_axes=axes,
        joint_rest_positions=rng.normal(size=(20, 3)) * 0.05,
        landmark_rest_positions=rng.normal(size=(n_lm, 3)) * 0.08,
        landmark_rest_bone_weights=lm_w,
        landmark_rest_bone_indices=lm_idx,
        mesh_vertices=rng.normal(size=(v, 3)) * 0.07 if with_mesh else None,
        mesh_triangles=tri if with_mesh else None,
        dense_bone_weights=dense if with_mesh else None,
    )


def oracle_umetrack_frames(model, angles, wrist):
    """Direct transcription of umetrack_layer.py:58-168 with loops."""
    frames = [wrist.copy(), wrist.copy()]
    for f in range(5):
        chain = wrist.copy()
        finger = []
        for d in range(4):
            j = 4 * f + d
            rot = axis_angle_to_matrix(model.joint_rotation_axes[j] * angles[j])
            local = np.eye(4)
            local[:3, :3] = rot
            local[:3, 3] = model.joint_rest_positions[j] - rot @ model.joint_rest_positions[j]
            chain = chain @ local
            finger.append(chain.copy())
        frames.extend(finger[1:])
    return np.stack(frames)


def oracle_umetrack_skin(model, angles, wrist, points, weights):
    frames = oracle_umetrack_frames(model, angles, wrist)
    out = np.zeros_like(points)
    for vi in range(points.shape[0]):
        p = np.append(points[vi], 1.0)
        acc = np.zeros(4)
        for k in range(NUM_JOINT_FRAMES):
            acc += weights[vi, k] * (frames[k] @ p)
        out[vi] = acc[:3]
    return out


def test_dense_skinning_weights_scatter():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 17, size=(2, 5, 3))
    w = rng.uniform(size=(2, 5, 3))
    w[0, 1, 2] = 0.0
    dense = dense_skinning_weights(idx, w, 17)
    assert dense.shape == (2, 5, 17)
    for b in range(2):
        for v in range(5):
            ref = np.zeros(17)
            for k in range(3):
                if w[b, v, k] != 0:
                    ref[idx[b, v, k]] = w[b, v, k]
            np.testing.assert_allclose(dense[b, v], ref)


def test_umetrack_landmarks_match_loop_oracle():
    rng = np.random.default_rng(1)
    model = make_umetrack_model(rng)
    angles = rng.uniform(-0.8, 0.8, size=(3, 20))
    wrists = np.stack([random_se3(rng) for _ in range(3)])
    got = umetrack_skin_landmarks(model, angles, wrists)
    dense = dense_skinning_weights(
        model.landmark_rest_bone_indices[None],
        model.landmark_rest_bone_weights[None],
        NUM_JOINT_FRAMES,
    )[0]
    for b in range(3):
        ref = oracle_umetrack_skin(
            model, angles[b], wrists[b], model.landmark_rest_positions, dense
        )
        np.testing.assert_allclose(got[b], ref, atol=1e-12)


def test_umetrack_vertices_match_loop_oracle():
    rng = np.random.default_rng(2)
    model = make_umetrack_model(rng)
    angles = rng.uniform(-0.5, 0.5, size=20)
    wrist = random_se3(rng)
    got = umetrack_skin_vertices(model, angles, wrist)
    ref = oracle_umetrack_skin(
        model, angles, wrist, model.mesh_vertices, model.dense_bone_weights
    )
    np.testing.assert_allclose(got, ref, atol=1e-12)
    assert got.shape == model.mesh_vertices.shape


def test_umetrack_zero_pose_identity_wrist_is_rest():
    rng = np.random.default_rng(3)
    model = make_umetrack_model(rng)
    lm = umetrack_skin_landmarks(model, np.zeros(20), np.eye(4))
    np.testing.assert_allclose(lm, model.landmark_rest_positions, atol=1e-12)


def test_umetrack_wrist_motion_is_rigid():
    rng = np.random.default_rng(4)
    model = make_umetrack_model(rng)
    angles = rng.uniform(-0.6, 0.6, size=20)
    w = random_se3(rng)
    at_identity = umetrack_skin_vertices(model, angles, np.eye(4))
    at_w = umetrack_skin_vertices(model, angles, w)
    moved = at_identity @ w[:3, :3].T + w[:3, 3]
    np.testing.assert_allclose(at_w, moved, atol=1e-12)


def test_umetrack_json_roundtrip_mm_to_m(tmp_path):
    rng = np.random.default_rng(5)
    model = make_umetrack_model(rng)
    blob = {
        "hand_model": {
            "joint_rotation_axes": model.joint_rotation_axes.tolist(),
            "joint_rest_positions": (model.joint_rest_positions / 1e-3).tolist(),
            "landmark_rest_positions": (model.landmark_rest_positions / 1e-3).tolist(),
            "landmark_rest_bone_weights": model.landmark_rest_bone_weights.tolist(),
            "landmark_rest_bone_indices": model.landmark_rest_bone_indices.tolist(),
            "mesh_vertices": (model.mesh_vertices / 1e-3).tolist(),
            "mesh_triangles": model.mesh_triangles.tolist(),
            "dense_bone_weights": model.dense_bone_weights.tolist(),
        }
    }
    path = tmp_path / "hand_profile.json"
    path.write_text(json.dumps(blob))
    loaded = load_umetrack_hand_model(str(path))
    np.testing.assert_allclose(loaded.joint_rest_positions, model.joint_rest_positions)
    np.testing.assert_allclose(loaded.mesh_vertices, model.mesh_vertices)
    assert loaded.mesh_triangles.dtype == np.int64
    assert load_umetrack_hand_model(str(tmp_path / "missing.json")) is None


def test_umetrack_provider_right_hand_flips_x():
    rng = np.random.default_rng(6)
    model = make_umetrack_model(rng)
    provider = UmeTrackHandMeshProvider(model)
    angles = rng.uniform(-0.4, 0.4, size=20).tolist()
    wrist = random_se3(rng)
    pose_l = HandPose(Handedness.Left, Pose3d(wrist[:3, :3], wrist[:3, 3]), angles)
    pose_r = HandPose(Handedness.Right, Pose3d(wrist[:3, :3], wrist[:3, 3]), angles)
    v_left = provider.get_hand_mesh_vertices(pose_l)
    v_right = provider.get_hand_mesh_vertices(pose_r)
    flipped = wrist.copy()
    flipped[:, 0] *= -1
    np.testing.assert_allclose(v_left, umetrack_skin_vertices(model, angles, wrist))
    np.testing.assert_allclose(
        v_right, umetrack_skin_vertices(model, angles, flipped)
    )
    tris, normals = provider.get_hand_mesh_faces_and_normals(pose_l)
    assert tris.shape == model.mesh_triangles.shape
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-9)
    assert provider.get_hand_landmarks(pose_l).shape == (21, 3)


# ---------------------------------------------------------------------------
# MANO


MANO_PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14])


def make_mano_asset(rng, v=30, is_rhand=True) -> ManoAsset:
    j = 16
    j_reg = np.zeros((j, v))
    for jj in range(j):
        cols = rng.choice(v, size=3, replace=False)
        w = rng.uniform(0.2, 1.0, size=3)
        j_reg[jj, cols] = w / w.sum()
    weights = rng.uniform(0.0, 1.0, size=(v, j))
    weights /= weights.sum(-1, keepdims=True)
    return ManoAsset(
        v_template=rng.normal(size=(v, 3)) * 0.1,
        shapedirs=rng.normal(size=(v, 3, 10)) * 0.01,
        posedirs=rng.normal(size=((j - 1) * 9, v * 3)) * 0.005,
        J_regressor=j_reg,
        weights=weights,
        parents=MANO_PARENTS,
        hands_components=rng.normal(size=(15, (j - 1) * 3)) * 0.3,
        hands_mean=rng.normal(size=((j - 1) * 3,)) * 0.05,
        faces=rng.integers(0, v, size=(20, 3)),
        is_rhand=is_rhand,
    )


def oracle_mano(asset, betas, orient, pca, transl, use_pca=True, flat=False):
    """Loop transcription of smplx's MANO forward (mano_layer.py:135-157
    call path): blendshapes -> FK -> LBS, one joint / vertex at a time."""
    v_n = asset.v_template.shape[0]
    j_n = asset.num_joints
    v_shaped = asset.v_template.copy()
    for vi in range(v_n):
        for k in range(3):
            v_shaped[vi, k] += asset.shapedirs[vi, k] @ betas
    joints_rest = asset.J_regressor @ v_shaped
    full = pca @ asset.hands_components[: len(pca)] if use_pca else pca.copy()
    if not flat:
        full = full + asset.hands_mean
    aa = np.concatenate([orient, full]).reshape(j_n, 3)
    rots = [axis_angle_to_matrix(aa[i]) for i in range(j_n)]
    feature = np.concatenate([(r - np.eye(3)).ravel() for r in rots[1:]])
    v_posed = v_shaped + (feature @ asset.posedirs).reshape(v_n, 3)
    world = [None] * j_n
    for jj in range(j_n):
        local = np.eye(4)
        local[:3, :3] = rots[jj]
        local[:3, 3] = joints_rest[jj] - (
            joints_rest[asset.parents[jj]] if jj else 0.0
        )
        world[jj] = local if jj == 0 else world[asset.parents[jj]] @ local
    posed_joints = np.stack([w[:3, 3] for w in world])
    verts = np.zeros((v_n, 3))
    for vi in range(v_n):
        acc = np.zeros(3)
        for jj in range(j_n):
            g_rot = world[jj][:3, :3]
            g_t = world[jj][:3, 3] - g_rot @ joints_rest[jj]
            acc += asset.weights[vi, jj] * (g_rot @ v_posed[vi] + g_t)
        verts[vi] = acc
    return verts + transl, posed_joints + transl


def test_mano_forward_matches_loop_oracle():
    rng = np.random.default_rng(10)
    asset = make_mano_asset(rng)
    betas = rng.normal(size=(2, 10)) * 0.5
    orient = rng.normal(size=(2, 3))
    pca = rng.normal(size=(2, 15))
    transl = rng.normal(size=(2, 3)) * 0.3
    verts, joints = mano_forward(asset, betas, orient, pca, transl)
    for b in range(2):
        rv, rj = oracle_mano(asset, betas[b], orient[b], pca[b], transl[b])
        np.testing.assert_allclose(verts[b], rv, atol=1e-10)
        np.testing.assert_allclose(joints[b], rj, atol=1e-10)


def test_mano_rest_pose_is_template():
    rng = np.random.default_rng(11)
    asset = make_mano_asset(rng)
    transl = np.array([0.1, -0.2, 0.3])
    verts, joints = mano_forward(
        asset,
        np.zeros(10),
        np.zeros(3),
        np.zeros(15),
        transl,
        flat_hand_mean=True,
    )
    np.testing.assert_allclose(verts[0], asset.v_template + transl, atol=1e-12)
    np.testing.assert_allclose(
        joints[0], asset.J_regressor @ asset.v_template + transl, atol=1e-12
    )


def test_mano_global_orient_is_rigid_about_root():
    rng = np.random.default_rng(12)
    asset = make_mano_asset(rng)
    aa = rng.normal(size=3)
    rot = axis_angle_to_matrix(aa)
    verts, _ = mano_forward(
        asset, np.zeros(10), aa, np.zeros(15), np.zeros(3), flat_hand_mean=True
    )
    root = asset.J_regressor @ asset.v_template
    expected = (asset.v_template - root[0]) @ rot.T + root[0]
    np.testing.assert_allclose(verts[0], expected, atol=1e-10)


def test_mano_hand_model_landmark_protocol():
    rng = np.random.default_rng(13)
    left = make_mano_asset(rng, v=778, is_rhand=False)
    right = make_mano_asset(rng, v=778, is_rhand=True)
    model = ManoHandModel(left, right)
    shape = rng.normal(size=10) * 0.3
    angles = rng.normal(size=(2, 15)) * 0.4
    xform = np.concatenate(
        [rng.normal(size=(2, 3)), rng.normal(size=(2, 3)) * 0.2], axis=1
    )
    verts, lm = model.forward_kinematics(
        shape, angles, xform, np.array([False, True])
    )
    assert verts.shape == (2, 778, 3)
    assert lm.shape == (2, len(MANO_JOINT_MAPPING), 3)  # 20 mapped landmarks
    # Row 0 went through the LEFT asset; rebuild its landmarks manually.
    rv, rj = mano_forward(
        model.left, shape[None], xform[0:1, :3], angles[0:1], xform[0:1, 3:]
    )
    tips = rv[0][list(MANO_FINGERTIP_VERT_INDICES.values())]
    ref_lm = np.concatenate([rj[0], tips])[MANO_JOINT_MAPPING]
    np.testing.assert_allclose(lm[0], ref_lm, atol=1e-12)
    np.testing.assert_allclose(verts[0], rv[0], atol=1e-12)

    # Unbatched input squeezes the outputs (mano_layer.py:213-215).
    v1, l1 = model.forward_kinematics(
        shape, angles[1], xform[1], np.array([True])
    )
    assert v1.shape == (778, 3) and l1.shape == (len(MANO_JOINT_MAPPING), 3)
    np.testing.assert_allclose(v1, verts[1], atol=1e-12)


def test_mano_left_shapedirs_bugfix_flip():
    rng = np.random.default_rng(14)
    right = make_mano_asset(rng, is_rhand=True)
    broken_left = make_mano_asset(rng, is_rhand=False)
    broken_left.shapedirs = right.shapedirs.copy()  # the smplx #48 symptom
    model = ManoHandModel(broken_left, right)
    np.testing.assert_allclose(
        model.left.shapedirs[:, 0, :], -right.shapedirs[:, 0, :]
    )
    np.testing.assert_allclose(
        model.left.shapedirs[:, 1:, :], right.shapedirs[:, 1:, :]
    )
    # Distinct assets are left untouched.
    ok_left = make_mano_asset(np.random.default_rng(15), is_rhand=False)
    model2 = ManoHandModel(ok_left, right)
    np.testing.assert_allclose(model2.left.shapedirs, ok_left.shapedirs)


def test_mano_mesh_provider_from_hand_pose():
    rng = np.random.default_rng(16)
    model = ManoHandModel(
        make_mano_asset(rng, v=778, is_rhand=False),
        make_mano_asset(rng, v=778, is_rhand=True),
    )
    provider = ManoHandMeshProvider(model, rng.normal(size=10) * 0.2)
    wrist = random_se3(rng)
    pose = HandPose(
        Handedness.Right,
        Pose3d(wrist[:3, :3], wrist[:3, 3]),
        (rng.normal(size=15) * 0.3).tolist(),
    )
    verts = provider.get_hand_mesh_vertices(pose)
    lm = provider.get_hand_landmarks(pose)
    assert verts.shape == (778, 3) and lm.shape == (len(MANO_JOINT_MAPPING), 3)
    faces, normals = provider.get_hand_mesh_faces_and_normals(pose)
    assert faces.shape[1] == 3
    referenced = np.unique(faces)
    np.testing.assert_allclose(
        np.linalg.norm(normals[referenced], axis=-1), 1.0, atol=1e-9
    )
    # Missing shape params -> None (ManoHandDataProvider.py:57-61).
    assert ManoHandMeshProvider(model, None).get_hand_mesh_vertices(pose) is None


def test_axis_angle_matrix_roundtrip():
    rng = np.random.default_rng(17)
    for _ in range(20):
        axis = rng.normal(size=3)
        aa = axis / np.linalg.norm(axis) * rng.uniform(0.01, 3.0)  # < pi
        np.testing.assert_allclose(
            matrix_to_axis_angle(axis_angle_to_matrix(aa)), aa, atol=1e-9
        )
    np.testing.assert_allclose(matrix_to_axis_angle(np.eye(3)), np.zeros(3))
    # Zero angle is safe (the reference divides by the norm).
    np.testing.assert_allclose(axis_angle_to_matrix(np.zeros(3)), np.eye(3))


def test_load_mano_pkl_plain_numpy(tmp_path):
    """The loader accepts a plain-numpy pickle (what the chumpy shim
    reduces the licensed asset to)."""
    rng = np.random.default_rng(18)
    asset = make_mano_asset(rng)
    blob = {
        "v_template": asset.v_template,
        "shapedirs": asset.shapedirs,
        "posedirs": asset.posedirs.T.reshape(asset.v_template.shape[0], 3, -1),
        "J_regressor": asset.J_regressor,
        "weights": asset.weights,
        "kintree_table": np.stack([MANO_PARENTS, np.arange(16)]),
        "hands_components": asset.hands_components,
        "hands_mean": asset.hands_mean,
        "f": asset.faces,
    }
    path = tmp_path / "MANO_RIGHT.pkl"
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    loaded = load_mano_pkl(str(path), is_rhand=True)
    np.testing.assert_allclose(loaded.v_template, asset.v_template)
    np.testing.assert_allclose(loaded.posedirs, asset.posedirs)
    np.testing.assert_allclose(loaded.parents, MANO_PARENTS)
    verts, _ = mano_forward(
        loaded, np.zeros(10), np.zeros(3), np.zeros(15), np.zeros(3),
        flat_hand_mean=True,
    )
    np.testing.assert_allclose(verts[0], asset.v_template, atol=1e-12)


def test_triangular_mesh_normals_flat_square():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    normals = triangular_mesh_normals(verts, tris)
    np.testing.assert_allclose(normals, np.tile([0, 0, 1.0], (4, 1)), atol=1e-12)
