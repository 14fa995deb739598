"""Trajectory-extraction robustness under realistic input corruption.

Sweeps depth noise / quantization / holes and track jitter / dropout on
the synthetic rendered clip (the operating conditions of the reference:
DepthAnything depth into registration, 7_get_object_trajectory.py:
112-124 + pcm_tools.py:5-66, tracker pixels into the depth-ratio scale,
7_get:220-230) and records the ADE / rotation degradation curve to
ROBUSTNESS.json.  This is the stand-in for real-data parity on a host
with no reference checkpoints or GPU (VERDICT r2 #4).

    python scripts/robustness_curve.py [--out ROBUSTNESS.json]
"""
import argparse
import json
import sys
import os

import jax

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS", "") != "axon":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ROBUSTNESS.json")
    args = ap.parse_args()

    from test_trajectory_pipeline import make_clip, small_cfg, F, PP, W, H
    import dataclasses

    from egoscaler_tpu.pipelines.perturb import perturb_depth, perturb_tracks
    from egoscaler_tpu.pipelines.trajectory import extract_trajectory

    t = 4
    obj_step = np.array([0.0, 0.025, 0.0])
    frames, masks, tracks = make_clip(
        np.random.default_rng(7), t, (0.03, 0, 0), tuple(obj_step)
    )
    keep = np.round(tracks[..., :2]).astype(int)

    def run(fr, tr, robust=False, hardened=False):
        cfg = dataclasses.replace(small_cfg(), ratio_robust=robust)
        if hardened:
            # the round-4 noise-hardened configuration (PCMConfig doc):
            # depth median prefilter + adaptive inlier thresholds +
            # per-pair identity fallback + median depth-ratio
            cfg = dataclasses.replace(
                small_cfg(), ratio_robust=True,
                pcm=dataclasses.replace(
                    small_cfg().pcm, adaptive_noise=True,
                    fitness_floor=0.25,
                ),
            )
        res = extract_trajectory(
            jnp.asarray(fr), jnp.asarray(masks), jnp.asarray(tr),
            jnp.asarray(t), F, PP, cfg=cfg,
            max_keypoints=1024, num_hypotheses=512, key=jax.random.PRNGKey(0),
        )
        traj = np.asarray(res.traj_quat)
        gt = traj[0, :3] + obj_step[None] * np.arange(t)[:, None]
        return {
            "ok": bool(res.ok),
            "ade": round(float(np.linalg.norm(traj[:, :3] - gt, axis=1).mean()), 5),
            "rot_err": round(float(np.abs(traj[:, 3:6]).max()), 5),
        }

    rng = np.random.default_rng(42)
    rows = [{"perturbation": "clean", **run(frames, tracks)}]
    for nf in (0.01, 0.02, 0.03, 0.05):
        rows.append({
            "perturbation": f"depth_noise_{nf:g}",
            **run(perturb_depth(frames, rng, noise_frac=nf), tracks),
        })
    # hardened arm (adaptive_noise + fitness_floor + ratio_robust):
    # the realistic monocular-depth operating point is >=5% error —
    # GATED: the 5% row must stay under 0.03 m ADE (VERDICT r3 item 5)
    hardened_rows = []
    for nf in (0.03, 0.05):
        noisy = perturb_depth(
            frames, np.random.default_rng(1000 + int(nf * 100)),
            noise_frac=nf,
        )
        hardened_rows.append({
            "perturbation": f"depth_noise_{nf:g}_hardened",
            **run(noisy, tracks, hardened=True),
        })
        rows.append(hardened_rows[-1])
    rows.append({"perturbation": "clean_hardened",
                 **run(frames, tracks, hardened=True)})
    gate = hardened_rows[-1]
    assert gate["ok"] and gate["ade"] < 0.03, (
        f"5%-depth-noise hardened gate FAILED: {gate}"
    )
    for qs in (0.01, 0.02):
        rows.append({
            "perturbation": f"depth_quant_{qs:g}m",
            **run(perturb_depth(frames, rng, quant_step=qs), tracks),
        })
    for hf in (0.05, 0.15):
        rows.append({
            "perturbation": f"depth_holes_{hf:g}",
            **run(perturb_depth(frames, rng, hole_frac=hf, keep_px=keep), tracks),
        })
    for jp in (0.25, 0.5, 1.0):
        tr = perturb_tracks(tracks, rng, jitter_px=jp, jitter_z_frac=0.01)
        rows.append({
            "perturbation": f"track_jitter_{jp:g}px_mean_ratio",
            **run(frames, tr),
        })
        rows.append({
            "perturbation": f"track_jitter_{jp:g}px_median_ratio",
            **run(frames, tr, robust=True),
        })
    rows.append({
        "perturbation": "track_dropout_0.25",
        **run(frames, perturb_tracks(
            tracks, rng, dropout_frac=0.25, frame_size=(W, H))),
    })
    combo_fr = perturb_depth(
        frames, rng, noise_frac=0.02, quant_step=0.01, hole_frac=0.05,
        keep_px=keep,
    )
    combo_tr = perturb_tracks(
        tracks, rng, jitter_px=0.5, jitter_z_frac=0.01, dropout_frac=0.125,
        frame_size=(W, H),
    )
    rows.append({"perturbation": "combo_mean_ratio", **run(combo_fr, combo_tr)})
    rows.append({
        "perturbation": "combo_median_ratio", **run(combo_fr, combo_tr, robust=True)
    })

    out = {
        "scene": "synthetic rendered clip (tests/test_trajectory_pipeline.make_clip), "
                 "moving camera (0.03 m/frame) + moving object (0.025 m/frame)",
        "platform": jax.devices()[0].platform,
        "metric": "ADE [m] vs ground-truth object trajectory; rot_err = max |rotvec|",
        "notes": [
            "depth noise is multiplicative gaussian; parity config breaks at 5% "
            "(10 cm at scene depth); the *_hardened rows (adaptive_noise + "
            "fitness_floor=0.25 + ratio_robust, round 4) are GATED: 5% must stay "
            "under 0.03 m ADE",
            "holes keep track pixels valid: the reference samples depth at track "
            "pixels with no validity filter (7_get:224), that bias is shared",
            "median_ratio rows use DataConfig.ratio_robust=True (beyond parity)",
        ],
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for r in rows:
        print(r)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
