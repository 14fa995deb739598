"""Golden-clip tests on the real EgoScaler demo assets.

`/root/reference/assets/demo/` ships an actual pipeline output: the
1408x1408 Aria observation frame, the action text, and a trajectory
pickle carrying the legacy `traj` key (SURVEY.md §8.4 — vis/video.py:97
predates the traj_quat rename).  depth.npy is referenced by
vis/video.py:63 but absent from this snapshot, so the render test
synthesizes a smooth depth surface; everything else is real data.
"""
import os
import pickle
import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from egoscaler_tpu.geometry.rotations import (
    quat_from_rotvec,
    rotvec_from_quat,
)
from egoscaler_tpu.vis.render import load_trajectory, render_demo

DEMO = "/root/reference/assets/demo"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO), reason="reference demo assets unavailable"
)


@pytest.fixture(scope="module")
def demo_traj():
    return load_trajectory(os.path.join(DEMO, "trajectory.pkl"))


def test_legacy_pickle_schema(demo_traj):
    """load_trajectory maps the legacy 'traj' key to traj_quat (§8.4)."""
    assert demo_traj["init_bbox"].shape == (8, 3)
    assert "traj_quat" in demo_traj
    assert demo_traj["traj_quat"].shape[1] == 7
    assert demo_traj["traj_rotvec"].shape == (
        demo_traj["traj_quat"].shape[0],
        6,
    )
    with open(os.path.join(DEMO, "trajectory.pkl"), "rb") as f:
        raw = pickle.load(f)
    np.testing.assert_array_equal(demo_traj["traj_quat"], raw["traj"])


def test_rotation_representations_consistent(demo_traj):
    """The shipped traj (xyz+quat) and traj_rotvec (xyz+rotvec) encode the
    same waypoints; our scipy-compatible converters must map one onto the
    other (7_get_object_trajectory.py:321-328 writes both via scipy)."""
    quat_traj = demo_traj["traj_quat"]
    rotvec_traj = demo_traj["traj_rotvec"]

    # identical positions
    np.testing.assert_allclose(quat_traj[:, :3], rotvec_traj[:, :3], atol=1e-9)

    quats = quat_traj[:, 3:]  # xyzw (scipy as_quat order)
    rotvecs = rotvec_traj[:, 3:]

    ours_rotvec = np.asarray(rotvec_from_quat(jnp.asarray(quats)))
    np.testing.assert_allclose(ours_rotvec, rotvecs, atol=1e-6)

    ours_quat = np.asarray(quat_from_rotvec(jnp.asarray(rotvecs)))
    sign = np.where(np.sum(ours_quat * quats, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    np.testing.assert_allclose(ours_quat * sign, quats, atol=1e-6)


def test_init_bbox_is_parallelepiped(demo_traj):
    """The 8 OBB corners must form a rectangular parallelepiped in Open3D
    get_box_points order.  The demo pickle stores the box uncentered —
    vis/video.py:92-94 subtracts the corner mean at load, as we do here."""
    box = demo_traj["init_bbox"]
    box = box - box.mean(axis=0)

    e1, e2, e3 = box[1] - box[0], box[2] - box[0], box[3] - box[0]
    # opposite corner = origin corner + all three edges
    np.testing.assert_allclose(box[4], box[0] + e1 + e2 + e3, atol=1e-7)
    np.testing.assert_allclose(box[5], box[0] + e2 + e3, atol=1e-7)
    np.testing.assert_allclose(box[6], box[0] + e1 + e3, atol=1e-7)
    np.testing.assert_allclose(box[7], box[0] + e1 + e2, atol=1e-7)
    # edges mutually orthogonal (it is a box, not a sheared cell)
    for a, b in ((e1, e2), (e1, e3), (e2, e3)):
        cos = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos < 1e-5


def test_real_image_backprojects_and_normalizes():
    """Back-project the real 1408^2 Aria frame (synthetic smooth depth) at
    the real intrinsics, then pc_norm + FPS — the model-input path of
    pipelines/trajectory.py on actual pipeline imagery."""
    from PIL import Image

    from egoscaler_tpu.geometry.camera import get_points_colors
    from egoscaler_tpu.models.pointbert import pc_norm
    from egoscaler_tpu.ops.fps import farthest_point_sampling, gather_points

    image = np.asarray(Image.open(os.path.join(DEMO, "image.jpg")))
    assert image.shape == (1408, 1408, 3)
    h, w = image.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = 1.5 + 0.5 * np.sin(xx / 200.0) * np.cos(yy / 170.0)

    # quarter-res for test speed; intrinsics scale with the image
    image_small = image[::4, ::4]
    depth_small = depth[::4, ::4]
    rgbd = np.concatenate(
        [image_small.astype(np.float32), depth_small[..., None]], axis=-1
    )
    pts, cols, valid = get_points_colors(
        jnp.asarray(rgbd), 605.343 / 4, 605.343 / 4, 703.5 / 4, d_thres=5.0
    )
    pts, cols, valid = np.asarray(pts), np.asarray(cols), np.asarray(valid)
    assert valid.sum() > 0.5 * valid.size
    assert np.isfinite(pts[valid]).all()
    assert cols.min() >= 0.0 and cols.max() <= 1.0

    sel = np.nonzero(valid)[0][:4096]
    cloud = np.concatenate([pts[sel], cols[sel]], axis=-1)[None]
    normed = np.asarray(pc_norm(jnp.asarray(cloud)))
    radii = np.linalg.norm(normed[0, :, :3], axis=-1)
    assert radii.max() <= 1.0 + 1e-5

    idx = farthest_point_sampling(jnp.asarray(normed[..., :3]), 128)
    centers = np.asarray(gather_points(jnp.asarray(normed), idx))
    assert centers.shape == (1, 128, 6)
    assert np.isfinite(centers).all()


def test_render_demo_on_real_assets(tmp_path):
    """vis/video.py-equivalent render over the real demo directory (with
    the missing depth.npy synthesized)."""
    demo_copy = tmp_path / "demo"
    demo_copy.mkdir()
    for name in ("image.jpg", "trajectory.pkl", "text.txt"):
        shutil.copy(os.path.join(DEMO, name), demo_copy / name)
    h = w = 1408
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = 1.5 + 0.5 * np.sin(xx / 200.0) * np.cos(yy / 170.0)
    np.save(demo_copy / "depth.npy", depth)

    out = render_demo(
        str(demo_copy), out_path=str(tmp_path / "demo.mp4"), size=160
    )
    assert os.path.exists(out)
    assert os.path.getsize(out) > 0


# ---------------------------------------------------------------------------
# Round-4 additions: stage-7 golden artifact (examples/demo_stage7_golden.py
# runs the geometry half of stage 7 on the real demo pixels and commits
# docs/demo/golden_trajectory.pkl) — waypoint-schema + OBB-corner-order
# equality with the shipped reference pickle.

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "demo", "golden_trajectory.pkl",
)


def test_obb_corner_order_matches_reference_demo(demo_traj):
    """The demo pickle's init_bbox uses Open3D's get_box_points corner
    order; our geometry.obb._CORNER_SIGNS must reproduce it EXACTLY
    (pcm_tools.py:106-123 writes np.asarray(obb.get_box_points()))."""
    from egoscaler_tpu.geometry.obb import _CORNER_SIGNS

    bb = np.asarray(demo_traj["init_bbox"], np.float64)
    center = bb.mean(axis=0)
    # recover the box frame from the reference ordering: corners 1,2,3
    # differ from corner 0 along exactly one axis each
    ex, ey, ez = bb[1] - bb[0], bb[2] - bb[0], bb[3] - bb[0]
    # the recovered edges must be mutually orthogonal (it IS a box)
    assert abs(ex @ ey) < 1e-6 * np.linalg.norm(ex) * np.linalg.norm(ey)
    assert abs(ex @ ez) < 1e-6
    assert abs(ey @ ez) < 1e-6
    axes = np.stack([ex / np.linalg.norm(ex), ey / np.linalg.norm(ey),
                     ez / np.linalg.norm(ez)], axis=1)
    half = np.array([np.linalg.norm(ex), np.linalg.norm(ey),
                     np.linalg.norm(ez)]) / 2.0
    rebuilt = center + (np.asarray(_CORNER_SIGNS) * half) @ axes.T
    np.testing.assert_allclose(rebuilt, bb, atol=1e-9)


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden artifact not generated")
def test_golden_artifact_schema_matches_demo(demo_traj):
    """Our stage-7 output pickle carries the reference schema: same key
    semantics, shapes, rotation-representation consistency, and the
    same OBB corner-pairing convention."""
    from egoscaler_tpu.geometry.rotations import quat_from_rotvec

    with open(GOLDEN, "rb") as f:
        ours = pickle.load(f)
    assert ours["init_bbox"].shape == (8, 3)
    n = ours["traj_quat"].shape[0]
    assert ours["traj_quat"].shape == (n, 7)
    assert ours["traj_rotvec"].shape == (n, 6)
    # positions identical across representations (7_get:321-328)
    np.testing.assert_allclose(
        ours["traj_quat"][:, :3], ours["traj_rotvec"][:, :3], atol=1e-6
    )
    # unit quaternions; rotvec -> quat consistent up to sign
    q = ours["traj_quat"][:, 3:]
    np.testing.assert_allclose(
        np.linalg.norm(q, axis=1), 1.0, atol=1e-4
    )
    q2 = np.asarray(quat_from_rotvec(jnp.asarray(ours["traj_rotvec"][:, 3:])))
    dots = np.abs(np.sum(q * q2, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)
    # corner-pairing convention matches the reference demo box:
    # corners (i, i+4) are antipodal through the center in both
    for bb in (ours["init_bbox"], np.asarray(demo_traj["init_bbox"])):
        c = bb - bb.mean(axis=0)
        np.testing.assert_allclose(c[:4], -c[4:], atol=1e-5)
