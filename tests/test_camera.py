"""Back-projection parity with the reference numpy implementation
(pcm_tools.py:68-96)."""
import numpy as np
import jax.numpy as jnp

from egoscaler_tpu.geometry import (
    backproject_depth,
    backproject_points,
    get_points_colors,
    project_points,
)
from egoscaler_tpu.geometry.camera import bbox_exclusion_mask


def reference_get_points_colors(rgbd, boxes, width, height, pp, fx, fy, d_thres):
    """Direct transcription of pcm_tools.py:68-96 for oracle comparison."""
    image = rgbd[:, :, :3]
    z = rgbd[:, :, -1]
    x, y = np.meshgrid(np.arange(width), np.arange(height))
    x = (x - pp) / fx
    y = (y - pp) / fy
    points = np.stack((x * z, y * z, z), axis=-1).reshape(-1, 3)
    colors = image.reshape(-1, 3) / 255.0
    valid_color = np.all(image != 0, axis=2)
    mask = np.ones((height, width))
    for box in boxes:
        mask[box["ymin"]:box["ymax"], box["xmin"]:box["xmax"]] = 0
    static = mask != 0
    valid = valid_color & static
    if d_thres is not None:
        valid &= z < d_thres
    return points[valid.ravel()], colors[valid.ravel()]


def test_get_points_colors_parity(rng):
    h = w = 32
    rgb = rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
    rgb[2, 3] = 0  # zero-color pixel must be dropped
    depth = rng.uniform(0.1, 8.0, size=(h, w)).astype(np.float32)
    rgbd = np.concatenate([rgb, depth[..., None]], axis=-1)
    boxes = [{"xmin": 4, "ymin": 5, "xmax": 10, "ymax": 12}]
    fx = fy = 605.343
    pp = 15.5
    d_thres = 5.0

    ref_pts, ref_cols = reference_get_points_colors(
        rgbd, boxes, w, h, pp, fx, fy, d_thres
    )

    boxes_arr = jnp.asarray([[4, 5, 10, 12]], jnp.int32)
    bmask = bbox_exclusion_mask(h, w, boxes_arr, jnp.asarray(1))
    pts, cols, valid = get_points_colors(
        jnp.asarray(rgbd), fx, fy, pp, bbox_mask=bmask, d_thres=d_thres
    )
    pts = np.asarray(pts)[np.asarray(valid)]
    cols = np.asarray(cols)[np.asarray(valid)]

    np.testing.assert_allclose(pts, ref_pts, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cols, ref_cols, rtol=1e-6)


def test_project_backproject_roundtrip(rng):
    pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 5.0, size=100)
    fx, fy, pp = 605.343, 605.343, 703.5
    uv = project_points(jnp.asarray(pts), fx, fy, pp)
    back = backproject_points(uv, jnp.asarray(pts[:, 2]), fx, fy, pp)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)


def test_backproject_depth_shape():
    depth = jnp.ones((8, 16))
    pts = backproject_depth(depth, 100.0, 100.0, 7.5)
    assert pts.shape == (8, 16, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 1.0)
