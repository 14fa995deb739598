"""Interactive 6DoF-trajectory viewer as a single self-contained HTML file.

TPU-native stand-in for the reference's Open3D window
(/root/reference/vis/interactive.py:21-125) and the rerun HOT3D GUI
(egoscaler/data/eval/Hot3DVisualizer.py): a TPU pod host is headless and
has zero egress, so instead of a GL window we export ONE .html file with
the scene embedded (base64 typed arrays) and a dependency-free JS
renderer — z-buffered point splatting, orbit/zoom/pan controls, a
trajectory timeline with play/scrub, per-waypoint gnomon axes, the OBB
wireframe riding the trajectory, and the narration caption.  Open it in
any browser; nothing is fetched from the network.

Exports:
* `export_interactive_html(points, colors, traj, out_path, ...)` — the
  demo-scene viewer (image+depth+trajectory.pkl of assets/demo).
* `export_hot3d_html(...)` — object/headset pose streams (the rerun
  viewer's core panels) rendered with the same engine.
"""
from __future__ import annotations

import base64
import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

from egoscaler_tpu.vis.render import BOX_EDGES

_EDGE_COLORS = {  # axis-colored like the reference line mesh (interactive.py:44-49)
    "x": "#e5484d", "y": "#30a46c", "z": "#3e63dd",
}


def _b64(arr: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


def _subsample(points, colors, max_points, seed=0):
    n = len(points)
    if n <= max_points:
        return points, colors
    idx = np.random.default_rng(seed).choice(n, max_points, replace=False)
    return points[idx], colors[idx]


_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title><style>
 body {{ margin:0; background:#0e1116; color:#dbe2ea; font:13px system-ui, sans-serif; overflow:hidden; }}
 #hud {{ position:fixed; left:12px; top:10px; max-width:46ch; pointer-events:none;
        text-shadow:0 1px 3px #000; line-height:1.45; }}
 #hud b {{ color:#fff; }}
 #bar {{ position:fixed; left:0; right:0; bottom:0; padding:10px 14px;
        background:linear-gradient(transparent, rgba(5,8,12,.85)); display:flex;
        gap:10px; align-items:center; }}
 #tl {{ flex:1; }} button {{ background:#222a35; color:#dbe2ea; border:1px solid #39434f;
        border-radius:6px; padding:4px 12px; cursor:pointer; }}
 canvas {{ display:block; cursor:grab; }}
</style></head><body>
<canvas id="c"></canvas>
<div id="hud"><b>{title}</b><br>{narration}<br>
 <span style="opacity:.7">drag orbit &middot; wheel zoom &middot; shift-drag pan &middot;
 space play &middot; &larr;/&rarr; step &middot; waypoint <span id="wp">0</span>/{t_last}</span></div>
<div id="bar"><button id="play">&#9654;</button>
 <input id="tl" type="range" min="0" max="{t_last}" value="0" step="1"></div>
<script>
"use strict";
const DATA = {data_json};
function f32(b64) {{ const s = atob(b64); const u = new Uint8Array(s.length);
  for (let i = 0; i < s.length; i++) u[i] = s.charCodeAt(i);
  return new Float32Array(u.buffer); }}
function u8(b64) {{ const s = atob(b64); const u = new Uint8Array(s.length);
  for (let i = 0; i < s.length; i++) u[i] = s.charCodeAt(i); return u; }}
const P = f32(DATA.points), C = u8(DATA.colors), N = P.length / 3;
const TRAJ = f32(DATA.traj), T = TRAJ.length / 7;
const BBOX = f32(DATA.bbox);            // 8 corners, object frame
const EDGES = DATA.edges;
const PATHS = DATA.paths.map(p => ({{ pts: f32(p.pts), color: p.color, label: p.label }}));
// scene center/extent
let cx = 0, cy = 0, cz = 0;
for (let i = 0; i < N; i++) {{ cx += P[3*i]; cy += P[3*i+1]; cz += P[3*i+2]; }}
cx /= Math.max(N,1); cy /= Math.max(N,1); cz /= Math.max(N,1);
let ext = 0.01;
for (let i = 0; i < N; i++) ext = Math.max(ext, Math.abs(P[3*i]-cx), Math.abs(P[3*i+1]-cy), Math.abs(P[3*i+2]-cz));
const cvs = document.getElementById('c'), ctx = cvs.getContext('2d');
let W = 0, H = 0, img = null, zbuf = null;
function resize() {{ W = innerWidth; H = innerHeight; cvs.width = W; cvs.height = H;
  img = ctx.createImageData(W, H); zbuf = new Float32Array(W * H); }}
addEventListener('resize', resize); resize();
let yaw = 0.5, pitch = -0.35, dist = ext * 2.6, panX = 0, panY = 0, wp = 0, playing = false;
function quatMat(x, y, z, w) {{  // xyzw -> 3x3 row-major
  return [1-2*(y*y+z*z), 2*(x*y-z*w), 2*(x*z+y*w),
          2*(x*y+z*w), 1-2*(x*x+z*z), 2*(y*z-x*w),
          2*(x*z-y*w), 2*(y*z+x*w), 1-2*(x*x+y*y)]; }}
function camera() {{
  const cyw = Math.cos(yaw), syw = Math.sin(yaw), cp = Math.cos(pitch), sp = Math.sin(pitch);
  // orthonormal rows: right, image-down, forward (= toward the center);
  // eye orbits the centroid at distance `dist`
  return {{ r: [cyw, 0, -syw,
               syw*sp, cp, cyw*sp,
               -syw*cp, sp, -cyw*cp],
           eye: [cx + dist*syw*cp + panX*cyw, cy - dist*sp + panY,
                 cz + dist*cyw*cp - panX*syw] }};
}}
function project(x, y, z, cam, out) {{
  const dx = x - cam.eye[0], dy = y - cam.eye[1], dz = z - cam.eye[2];
  const vx = cam.r[0]*dx + cam.r[1]*dy + cam.r[2]*dz;
  const vy = cam.r[3]*dx + cam.r[4]*dy + cam.r[5]*dz;
  const vz = cam.r[6]*dx + cam.r[7]*dy + cam.r[8]*dz;
  if (vz < ext * 1e-3) return false;
  const f = 1.1 * Math.min(W, H);
  out[0] = W/2 + f * vx / vz; out[1] = H/2 + f * vy / vz; out[2] = vz;
  return true;
}}
const pr = [0, 0, 0];
function render() {{
  const cam = camera();
  img.data.fill(0); zbuf.fill(1e30);
  for (let i = 0; i < W * H; i++) img.data[4*i+3] = 255;
  for (let i = 0; i < N; i++) {{
    if (!project(P[3*i], P[3*i+1], P[3*i+2], cam, pr)) continue;
    const u = pr[0] | 0, v = pr[1] | 0;
    if (u < 0 || v < 0 || u >= W || v >= H) continue;
    const k = v * W + u;
    if (pr[2] >= zbuf[k]) continue;
    zbuf[k] = pr[2];
    img.data[4*k] = C[3*i]; img.data[4*k+1] = C[3*i+1]; img.data[4*k+2] = C[3*i+2];
  }}
  ctx.putImageData(img, 0, 0);
  // trajectory path up to the current waypoint
  ctx.lineWidth = 2;
  for (const path of PATHS) {{
    ctx.strokeStyle = path.color; ctx.beginPath();
    let started = false;
    const n = path.pts.length / 3;
    for (let i = 0; i < n; i++) {{
      if (!project(path.pts[3*i], path.pts[3*i+1], path.pts[3*i+2], cam, pr)) continue;
      if (started) ctx.lineTo(pr[0], pr[1]); else {{ ctx.moveTo(pr[0], pr[1]); started = true; }}
    }}
    ctx.stroke();
  }}
  if (T > 0) {{
    ctx.strokeStyle = '#58d68d'; ctx.beginPath();
    let started = false;
    for (let i = 0; i <= wp; i++) {{
      if (!project(TRAJ[7*i], TRAJ[7*i+1], TRAJ[7*i+2], cam, pr)) continue;
      if (started) ctx.lineTo(pr[0], pr[1]); else {{ ctx.moveTo(pr[0], pr[1]); started = true; }}
    }}
    ctx.stroke();
    // gnomon + OBB at the current waypoint
    const o = 7 * wp;
    const m = quatMat(TRAJ[o+3], TRAJ[o+4], TRAJ[o+5], TRAJ[o+6]);
    const px = TRAJ[o], py = TRAJ[o+1], pz = TRAJ[o+2];
    const s = ext * 0.12;
    const axes = [[s,0,0,'{cx_col}'], [0,s,0,'{cy_col}'], [0,0,s,'{cz_col}']];
    const a0 = [0, 0, 0];
    if (project(px, py, pz, cam, pr)) {{ a0[0] = pr[0]; a0[1] = pr[1];
      for (const [ax, ay, az, col] of axes) {{
        const wx = px + m[0]*ax + m[1]*ay + m[2]*az;
        const wy = py + m[3]*ax + m[4]*ay + m[5]*az;
        const wz = pz + m[6]*ax + m[7]*ay + m[8]*az;
        if (!project(wx, wy, wz, cam, pr)) continue;
        ctx.strokeStyle = col; ctx.lineWidth = 2.5; ctx.beginPath();
        ctx.moveTo(a0[0], a0[1]); ctx.lineTo(pr[0], pr[1]); ctx.stroke();
      }}
    }}
    if (BBOX.length === 24) {{
      const cpts = [];
      for (let i = 0; i < 8; i++) {{
        const bx = BBOX[3*i], by = BBOX[3*i+1], bz = BBOX[3*i+2];
        const wx = px + m[0]*bx + m[1]*by + m[2]*bz;
        const wy = py + m[3]*bx + m[4]*by + m[5]*bz;
        const wz = pz + m[6]*bx + m[7]*by + m[8]*bz;
        cpts.push(project(wx, wy, wz, cam, pr) ? [pr[0], pr[1]] : null);
      }}
      ctx.strokeStyle = '#f5c542'; ctx.lineWidth = 1.5;
      for (const [a, b] of EDGES) {{
        if (!cpts[a] || !cpts[b]) continue;
        ctx.beginPath(); ctx.moveTo(cpts[a][0], cpts[a][1]);
        ctx.lineTo(cpts[b][0], cpts[b][1]); ctx.stroke();
      }}
    }}
  }}
  document.getElementById('wp').textContent = wp;
  document.getElementById('tl').value = wp;
}}
let dragging = false, lx = 0, ly = 0, panning = false;
cvs.addEventListener('mousedown', e => {{ dragging = true; panning = e.shiftKey; lx = e.clientX; ly = e.clientY; }});
addEventListener('mouseup', () => dragging = false);
addEventListener('mousemove', e => {{
  if (!dragging) return;
  const dx = e.clientX - lx, dy = e.clientY - ly; lx = e.clientX; ly = e.clientY;
  if (panning) {{ panX -= dx * dist * 0.0015; panY -= dy * dist * 0.0015; }}
  else {{ yaw += dx * 0.008; pitch = Math.max(-1.5, Math.min(1.5, pitch + dy * 0.008)); }}
  render();
}});
cvs.addEventListener('wheel', e => {{ dist *= Math.exp(e.deltaY * 0.001); render(); e.preventDefault(); }});
const tl = document.getElementById('tl'), playBtn = document.getElementById('play');
tl.addEventListener('input', () => {{ wp = +tl.value; render(); }});
function setPlay(v) {{ playing = v; playBtn.innerHTML = playing ? '&#10074;&#10074;' : '&#9654;'; }}
playBtn.addEventListener('click', () => setPlay(!playing));
addEventListener('keydown', e => {{
  if (e.code === 'Space') {{ setPlay(!playing); e.preventDefault(); }}
  if (e.code === 'ArrowRight') {{ wp = Math.min(T - 1, wp + 1); render(); }}
  if (e.code === 'ArrowLeft') {{ wp = Math.max(0, wp - 1); render(); }}
}});
setInterval(() => {{ if (playing && T > 0) {{ wp = (wp + 1) % T; render(); }} }}, 150);
render();
window.__viewer_ready = {{ n_points: N, n_waypoints: T }};
</script></body></html>
"""


def _build_html(
    points: np.ndarray,
    colors: np.ndarray,
    traj_quat: np.ndarray,
    init_bbox: Optional[np.ndarray],
    narration: str,
    title: str,
    paths: Sequence[Dict] = (),
    max_points: int = 200_000,
) -> str:
    points = np.asarray(points, np.float32).reshape(-1, 3)
    colors = np.asarray(colors)
    if colors.dtype != np.uint8:
        colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    colors = colors.reshape(-1, 3)
    points, colors = _subsample(points, colors, max_points)
    traj_quat = np.asarray(traj_quat, np.float32).reshape(-1, 7)
    bbox = (
        np.asarray(init_bbox, np.float32).reshape(8, 3)
        if init_bbox is not None else np.zeros((0, 3), np.float32)
    )
    data = {
        "points": _b64(points),
        "colors": _b64(colors),
        "traj": _b64(traj_quat),
        "bbox": _b64(bbox),
        "edges": [list(e) for e in BOX_EDGES],
        "paths": [
            {
                "pts": _b64(np.asarray(p["pts"], np.float32).reshape(-1, 3)),
                "color": p.get("color", "#76d7ea"),
                "label": p.get("label", ""),
            }
            for p in paths
        ],
    }
    return _TEMPLATE.format(
        title=title,
        narration=narration.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;"),
        t_last=max(len(traj_quat) - 1, 0),
        data_json=json.dumps(data),
        cx_col=_EDGE_COLORS["x"], cy_col=_EDGE_COLORS["y"],
        cz_col=_EDGE_COLORS["z"],
    )


def export_interactive_html(
    points: np.ndarray,
    colors: np.ndarray,
    traj: Dict[str, np.ndarray],
    out_path: str,
    narration: str = "",
    title: str = "EgoScaler trajectory",
    max_points: int = 200_000,
) -> str:
    """Write the self-contained viewer for one demo scene.

    `traj` is the trajectory-pickle dict (traj_quat (T, 7) xyzw,
    init_bbox (8, 3)) — the same schema vis/render.load_trajectory
    returns (legacy 'traj' key included).
    """
    if "traj_quat" not in traj and "traj" in traj:
        traj = dict(traj, traj_quat=np.asarray(traj["traj"]))
    bbox = traj.get("init_bbox")
    if bbox is not None:
        bbox = np.asarray(bbox, np.float32)
        bbox = bbox - bbox.mean(axis=0)  # object frame (interactive.py:52-54)
    html = _build_html(
        points, colors, np.asarray(traj["traj_quat"]), bbox,
        narration, title, max_points=max_points,
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path


def export_hot3d_html(
    object_paths: Dict[str, np.ndarray],
    headset_path: Optional[np.ndarray],
    out_path: str,
    points: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    title: str = "HOT3D sequence",
) -> str:
    """Write the HOT3D sequence viewer (object + headset pose streams —
    the Hot3DVisualizer.log_object_poses / log_aria_glasses panels).

    `object_paths`: uid -> (T, 3) positions; `headset_path`: (T, 3).
    """
    palette = ["#76d7ea", "#f5c542", "#e5484d", "#30a46c", "#b583f2",
               "#f2a65a"]
    paths = []
    for i, (uid, p) in enumerate(sorted(object_paths.items())):
        paths.append(
            {"pts": p, "color": palette[i % len(palette)], "label": str(uid)}
        )
    if headset_path is not None:
        paths.append({"pts": headset_path, "color": "#ffffff", "label": "headset"})
    if points is None:
        # anchor cloud: all path vertices, so orbit framing has extent
        allp = np.concatenate([np.asarray(p["pts"], np.float32).reshape(-1, 3)
                               for p in paths], axis=0)
        points = allp
        colors = np.full_like(points, 0.35)
    html = _build_html(
        points, colors, np.zeros((0, 7), np.float32), None, "", title,
        paths=paths,
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path
