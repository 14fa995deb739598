"""Interactive HTML viewer: embedded data integrity + projection math.

The viewer is a self-contained HTML file (no JS runtime on TPU hosts to
execute it here), so these tests (a) round-trip the embedded typed
arrays, and (b) re-implement the template's camera/projection JS in
numpy and assert the scene is actually in front of the camera and lands
on screen — the class of bug a GL window would show instantly.
"""
import base64
import json
import os
import re

import numpy as np
import pytest

from egoscaler_tpu.vis.interactive import (
    export_hot3d_html,
    export_interactive_html,
)


@pytest.fixture()
def scene(rng=None):
    r = np.random.default_rng(3)
    pts = r.normal(scale=0.4, size=(2000, 3)).astype(np.float32) + [0, 0, 1.5]
    cols = r.random((2000, 3)).astype(np.float32)
    t = np.linspace(0, 1, 12, dtype=np.float32)
    traj = np.stack(
        [0.3 * t, -0.2 * t, 1.5 + 0.1 * t,
         np.zeros_like(t), np.zeros_like(t), np.zeros_like(t),
         np.ones_like(t)], axis=1,
    )
    bbox = np.array(
        [[x, y, z] for x in (-0.05, 0.05) for y in (-0.04, 0.04)
         for z in (-0.03, 0.03)], np.float32,
    )
    return pts, cols, {"traj_quat": traj, "init_bbox": bbox}


def _extract_data(html: str) -> dict:
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "DATA blob not found"
    return json.loads(m.group(1))


def _f32(b64: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(b64), np.float32)


def test_export_embeds_scene(tmp_path, scene):
    pts, cols, traj = scene
    out = str(tmp_path / "v.html")
    export_interactive_html(pts, cols, traj, out, narration="pick <up> the mug")
    html = open(out).read()
    # no unsubstituted template placeholders survive .format
    assert "{title}" not in html and "{data_json}" not in html
    assert "__viewer_ready" in html
    assert "&lt;up&gt;" in html  # narration HTML-escaped
    data = _extract_data(html)
    p = _f32(data["points"]).reshape(-1, 3)
    np.testing.assert_allclose(p, pts, atol=1e-6)
    c = np.frombuffer(base64.b64decode(data["colors"]), np.uint8)
    assert c.shape == (2000 * 3,)
    tq = _f32(data["traj"]).reshape(-1, 7)
    np.testing.assert_allclose(tq, traj["traj_quat"], atol=1e-6)
    b = _f32(data["bbox"]).reshape(8, 3)
    np.testing.assert_allclose(b.mean(0), 0.0, atol=1e-6)  # object frame
    assert len(data["edges"]) == 12


def test_template_camera_math(tmp_path, scene):
    """Numpy re-implementation of the template's camera(): the centroid
    must land at the screen center with positive depth, and >90% of
    points must be in front of the camera at the initial view."""
    pts, cols, traj = scene
    c = pts.mean(axis=0)
    ext = np.abs(pts - c).max()
    yaw, pitch, dist = 0.5, -0.35, ext * 2.6
    cyw, syw = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    r = np.array([
        [cyw, 0, -syw],
        [syw * sp, cp, cyw * sp],
        [-syw * cp, sp, -cyw * cp],
    ])
    # orthonormal
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    eye = c + np.array([dist * syw * cp, -dist * sp, dist * cyw * cp])
    v = (pts - eye) @ r.T
    assert (v[:, 2] > 0).mean() > 0.9, "scene is behind the camera"
    vc = r @ (c - eye)
    np.testing.assert_allclose(vc[:2], 0.0, atol=1e-6)
    assert vc[2] > 0


def test_subsampling_caps_points(tmp_path, scene):
    pts, cols, traj = scene
    out = str(tmp_path / "small.html")
    export_interactive_html(pts, cols, traj, out, max_points=500)
    data = _extract_data(open(out).read())
    assert _f32(data["points"]).reshape(-1, 3).shape[0] == 500


def test_hot3d_export(tmp_path):
    t = np.linspace(0, 2 * np.pi, 40).astype(np.float32)
    objs = {"obj_a": np.stack([np.cos(t), 0 * t, np.sin(t)], 1)}
    head = np.stack([0.1 * t, 0 * t, -0.1 * t], 1)
    out = export_hot3d_html(objs, head, str(tmp_path / "h.html"))
    data = _extract_data(open(out).read())
    assert len(data["paths"]) == 2
    assert data["paths"][-1]["label"] == "headset"
    assert _f32(data["paths"][0]["pts"]).reshape(-1, 3).shape == (40, 3)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/assets/demo"),
    reason="reference demo assets unavailable",
)
def test_golden_demo_viewer(tmp_path):
    from egoscaler_tpu.vis.render import load_trajectory

    traj = load_trajectory("/root/reference/assets/demo/trajectory.pkl")
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    cols = rng.random((5000, 3)).astype(np.float32)
    out = export_interactive_html(
        pts, cols, traj, str(tmp_path / "demo.html"),
        narration=open("/root/reference/assets/demo/text.txt").read(),
    )
    data = _extract_data(open(out).read())
    tq = _f32(data["traj"]).reshape(-1, 7)
    assert tq.shape == traj["traj_quat"].shape  # legacy 'traj' key handled
