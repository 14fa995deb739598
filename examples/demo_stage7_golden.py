"""Stage-7 golden run on the REAL demo pixels (VERDICT r3 item 3).

`/root/reference/assets/demo` ships an actual reference pipeline output
(1408^2 Aria observation frame, action text, trajectory.pkl) but its
depth.npy is stripped from the snapshot.  Within zero-egress limits this
driver runs the GEOMETRY half of stage 7 end-to-end on the real image:

1. back-project every demo pixel onto a synthetic smooth metric-depth
   surface (documented stand-in for the absent depth.npy);
2. re-render the REAL pixels under a known camera ego-motion and a known
   object motion (the knife region translates) — an RGBD clip whose
   geometry is exactly known but whose appearance is the real scene;
3. run `pipelines.trajectory.extract_trajectory` (the ONE-program XLA
   stage-7 core: voxel/normals/FPFH/RANSAC/ICP registration + Kabsch
   trajectory, 7_get_object_trajectory.py:112-303) on it;
4. write the trajectory pickle with stage 7's exact schema
   {init_bbox (8,3), traj_quat (n,7), traj_rotvec (n,6)}
   (stage7_trajectory.py:300-316) and compare the recovered object
   motion against the injected ground truth;
5. render the committed MP4 + interactive HTML artifacts
   (vis/render.py, vis parity vs the reference vis/video.py:59-215),
   and ALSO render the reference's own trajectory.pkl.

Artifacts land in docs/demo/ and are asserted by
tests/test_golden_demo.py (waypoint-schema + OBB-corner-order equality
with the shipped demo pickle).

Usage: python examples/demo_stage7_golden.py [--platform tpu] [--tracker]
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEMO = "/root/reference/assets/demo"
OUT = os.path.join(REPO, "docs", "demo")

# reference demo camera (vis/video.py defaults), rescaled to our render
REF_F, REF_PP, REF_SIZE = 605.343, 703.5, 1408


def build_warped_clip(img, t, h, w, rng):
    """Real pixels + synthetic geometry: back-project onto a smooth
    surface, translate the camera (ego-motion) and the knife region
    (object motion), z-buffer splat each frame."""
    f = REF_F * h / REF_SIZE
    pp = REF_PP * h / REF_SIZE

    ys, xs = np.mgrid[0:h, 0:w]
    z = (1.8 + 0.25 * np.sin(2.5 * (xs / w - 0.5) * np.pi)
         * np.cos(2.0 * (ys / h - 0.5) * np.pi)).astype(np.float32)
    X = (xs - pp) / f * z
    Y = (ys - pp) / f * z
    pts = np.stack([X, Y, z], axis=-1).reshape(-1, 3)
    cols = (img.reshape(-1, 3) / 255.0).astype(np.float32)

    # knife region (lower-center of the frame in the demo image)
    oy, ox, oh, ow = int(0.55 * h), int(0.40 * w), h // 6, w // 4
    obj_mask2d = np.zeros((h, w), bool)
    obj_mask2d[oy:oy + oh, ox:ox + ow] = True
    obj_idx = np.nonzero(obj_mask2d.reshape(-1))[0]
    obj_vel = np.array([0.012, -0.004, 0.0], np.float32)  # m/frame

    qsel = rng.choice(obj_idx, size=64, replace=False)

    frames, masks, tracks = [], [], []
    for ti in range(t):
        cam = np.array([0.010 * ti, 0.004 * ti, 0.0], np.float32)
        p = pts.copy()
        p[obj_idx] += obj_vel * ti
        pc = p - cam
        zc = pc[:, 2]
        ok = zc > 0.2
        u = np.round(f * pc[:, 0] / zc + pp).astype(int)
        v = np.round(f * pc[:, 1] / zc + pp).astype(int)
        ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
        depth = np.zeros((h, w), np.float32)
        color = np.zeros((h, w, 3), np.float32)
        idx = np.nonzero(ok)[0][np.argsort(-zc[ok])]
        depth[v[idx], u[idx]] = zc[idx]
        color[v[idx], u[idx]] = cols[idx]
        frames.append(np.concatenate(
            [color * 255.0, depth[..., None]], axis=-1
        ))
        qc = p[qsel] - cam
        tracks.append(np.stack(
            [f * qc[:, 0] / qc[:, 2] + pp,
             f * qc[:, 1] / qc[:, 2] + pp, qc[:, 2]], axis=1
        ))
        m = np.zeros((h, w), bool)
        ou = u[obj_idx][ok[obj_idx]]
        ov = v[obj_idx][ok[obj_idx]]
        if len(ou):
            m[max(ov.min() - 2, 0):ov.max() + 3,
              max(ou.min() - 2, 0):ou.max() + 3] = True
        masks.append(m)
    return (np.stack(frames), np.stack(masks),
            np.stack(tracks).astype(np.float32), f, pp,
            pts, cols, obj_vel)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--tracker", action="store_true",
                    help="also run the trained window tracker on the "
                         "real-pixel clip and report px error vs the "
                         "projected ground truth")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from egoscaler_tpu.configs import DataConfig, PCMConfig
    from egoscaler_tpu.pipelines.trajectory import extract_trajectory

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)
    t, h = args.t, args.size
    w = h

    img = np.asarray(
        Image.open(os.path.join(DEMO, "image.jpg")).resize((w, h))
    )
    with open(os.path.join(DEMO, "text.txt")) as fh:
        text = fh.read().strip()
    print(f"demo narration: {text!r}")

    (frames, masks, tracks, f, pp,
     pts, cols, obj_vel) = build_warped_clip(img, t, h, w, rng)

    cfg = DataConfig(pcm=PCMConfig(voxel_size=0.1))
    ex = jax.jit(lambda fr, ma, tr: extract_trajectory(
        fr, ma, tr, jnp.asarray(t), f, pp, cfg=cfg,
        max_keypoints=2048, num_hypotheses=2048,
    ))
    print("extracting trajectory (compiling)...", flush=True)
    res = ex(jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(tracks))
    assert bool(res.ok), "demo clip rejected by stage-7 guards"

    # stage-7 writer schema (stage7_trajectory.py:300-316)
    traj = {
        "init_bbox": np.asarray(res.init_bbox),
        "traj_quat": np.asarray(res.traj_quat)[:t],
        "traj_rotvec": np.asarray(res.traj_rotvec)[:t],
    }
    with open(os.path.join(OUT, "golden_trajectory.pkl"), "wb") as fh:
        pickle.dump(traj, fh)

    # ground truth: the object translates by obj_vel per frame in WORLD
    # space; stage 7 reports motion relative to waypoint 0
    gt = np.arange(t)[:, None] * obj_vel[None, :]
    rec = traj["traj_quat"][:, :3] - traj["traj_quat"][0, :3]
    ade = float(np.linalg.norm(rec - gt, axis=1).mean())
    rot_err = float(np.abs(traj["traj_rotvec"][:, 3:]).max())
    print(f"recovered-vs-injected ADE {ade * 100:.2f} cm "
          f"(|motion| {np.linalg.norm(gt[-1]) * 100:.1f} cm), "
          f"max |rotvec| {rot_err:.4f} (pure translation injected)")

    summary = {
        "narration": text,
        "frames": t, "size": h,
        "ade_m": round(ade, 4),
        "gt_motion_m": round(float(np.linalg.norm(gt[-1])), 4),
        "max_rotvec_err": round(rot_err, 4),
        "ok": bool(res.ok),
    }

    if args.tracker:
        from egoscaler_tpu.models.tracker import (
            SpaTracker, SpaTrackerPredictor, load_tracker_asset,
        )

        asset = load_tracker_asset()
        if asset is None:
            print("tracker asset absent; skipping")
        else:
            tcfg, tparams = asset
            pred = SpaTrackerPredictor(SpaTracker(tcfg), tparams)
            clip01 = jnp.asarray(frames[..., :3] / 255.0, jnp.float32)
            depths = jnp.asarray(frames[..., 3], jnp.float32)
            out = np.asarray(pred(clip01, depths, jnp.asarray(tracks[0])))
            px = float(np.linalg.norm(
                out[..., :2] - tracks[..., :2], axis=-1
            ).mean())
            print(f"learned tracker on real pixels: {px:.2f} px mean err")
            summary["tracker_px_err"] = round(px, 3)

            # tracker -> registration END-TO-END: stage 7 consumes the
            # LEARNED tracks instead of ground truth — the reference
            # wiring, where SpaTracker output feeds the trajectory
            # extractor directly (7_get_object_trajectory.py:163-230)
            res_t = ex(jnp.asarray(frames), jnp.asarray(masks),
                       jnp.asarray(out.astype(np.float32)))
            if bool(res_t.ok):
                tq = np.asarray(res_t.traj_quat)[:t]
                rec_t = tq[:, :3] - tq[0, :3]
                ade_t = float(np.linalg.norm(rec_t - gt, axis=1).mean())
                summary["ade_tracker_seeded_m"] = round(ade_t, 4)
                print(f"tracker-seeded stage-7 ADE {ade_t * 100:.2f} cm "
                      f"(GT-seeded {ade * 100:.2f} cm)")
            else:
                summary["ade_tracker_seeded_m"] = None
                print("tracker-seeded clip rejected by stage-7 guards")

    with open(os.path.join(OUT, "golden_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)

    # ---- render OUR extracted trajectory over the real point cloud
    from egoscaler_tpu.vis.interactive import export_interactive_html
    from egoscaler_tpu.vis.render import (
        render_demo, render_trajectory_frames, write_video,
    )

    keep = rng.choice(len(pts), size=min(60000, len(pts)), replace=False)
    frames_mp4 = render_trajectory_frames(
        pts[keep], cols[keep], traj, size=480
    )
    write_video(frames_mp4, os.path.join(OUT, "golden_demo.mp4"))
    export_interactive_html(
        pts[keep], cols[keep], traj,
        os.path.join(OUT, "golden_demo.html"), narration=text,
    )

    # ---- render the REFERENCE's own trajectory.pkl (vis parity with
    # vis/video.py:59-215).  The snapshot strips depth.npy, so stage a
    # copy with the same synthesized smooth surface at full resolution.
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for name in ("image.jpg", "trajectory.pkl", "text.txt"):
            shutil.copy(os.path.join(DEMO, name), os.path.join(td, name))
        ys, xs = np.mgrid[0:REF_SIZE, 0:REF_SIZE]
        z = (1.8 + 0.25 * np.sin(2.5 * (xs / REF_SIZE - 0.5) * np.pi)
             * np.cos(2.0 * (ys / REF_SIZE - 0.5) * np.pi))
        np.save(os.path.join(td, "depth.npy"), z.astype(np.float32))
        render_demo(td, os.path.join(OUT, "reference_render.mp4"), size=480)
    for name in ("golden_trajectory.pkl", "golden_demo.mp4",
                 "golden_demo.html", "reference_render.mp4",
                 "golden_summary.json"):
        p = os.path.join(OUT, name)
        print("wrote", p, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
