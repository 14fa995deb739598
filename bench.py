"""Benchmark: HONEST end-to-end clip -> 6DoF-trajectory throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus a
per-stage breakdown on stderr).

The measured program covers the FULL stage-7 compute path at the
reference's operating points (7_get_object_trajectory.py:34-354):

  1. metric depth for all T frames — Depth-Anything-V2 ViT-L at 518^2
     (depth.py:13-63; reference runs it per frame);
  2. text-conditioned detection on the observation frame —
     Grounding-DINO (Swin-B + BERT-base) at 800^2
     (6_get_bounding_box.py:130-135);
  3. object segmentation on the observation frame — SAM ViT-H at 1024^2
     box-prompted (grounded_sam.py:179-208);
  4. 3D point tracking through the clip at 384x512 with mask-seeded
     queries (SpaTracker predictor.py:160-222 interface) — the trained
     window tracker (assets/tracker_occlusion.npz, sliding windows like
     the reference's SpaTracker), falling back to pyramidal LK when the
     weight asset is absent;
  5. per-frame-pair ego-motion cancellation + trajectory math — voxel
     downsample, normals, FPFH, batched-hypothesis RANSAC, 30-iteration
     colored ICP, transform chaining, Kabsch (pcm_tools.py:5-66,
     7_get:220-303) as ONE compiled XLA program.

Weights are randomly initialized (zero-egress host): compute cost is
architecture + shape dependent, not weight dependent.

vs_baseline: the reference runs stages 1-4 on GPU (~5-10 s/clip for a
16-frame window: per-frame ViT-L depth, GroundedSAM, sliding-window
SpaTracker) and stage 5 on CPU Open3D (RANSAC<=100k + colored ICP per
frame pair, ~1-2 s/pair x 15 pairs).  Total ~20-40 s/clip => 0.025-0.05
clips/s; we use 0.05 (the favorable end) as the denominator.  Open3D is
not installed on this host, so the denominator remains a documented
estimate — but numerator and denominator now cover the SAME pipeline.

The headline number is the PIPELINED per-clip time: 8 clips' stage
programs dispatched back-to-back and a single jitted reduction over
ALL their outputs fetched once (a dependent scalar, so the relay
cannot ack before every program has executed) — the production regime
of the reference's stage-7 driver loop (7_get:63), which processes
thousands of clips and never synchronizes per clip.  The single-clip
chained latency and per-stage medians — each paying the ~28 ms
per-call relay fetch overhead — are printed on stderr as a breakdown.

Set EGOSCALER_BENCH_FAST=1 to bench only the registration/trajectory
program (stage 5) for quick iteration.

Two operating points are measured and reported in the ONE JSON line:

* 16-frame window (clips_per_sec_16f / vs_baseline_16f): the round-1..3
  headline, kept for round-over-round comparability.
* 80-frame clip (the headline value): the reference's REAL clip is
  20 fps x 4 s = 80 frames (configs/camera.py:1-13;
  4_get_image.py:112-133 dumps 80 JPEGs) — stage 7 runs depth on ALL
  frames (7_get_object_trajectory.py:112-124), registers 79 frame
  pairs (:244-295), and tracks up to 800 mask-seeded queries
  (SpaTracker predictor.py:160-175 caps at 800).  Referenced
  denominator at this operating point: ~80 ViT-L depth frames +
  sliding-window SpaTracker on GPU (~15-40 s) and 79 Open3D
  RANSAC(<=100k)+colored-ICP pairs on CPU (~1-2 s/pair => 79-158 s),
  total ~100-200 s/clip => 0.005-0.01 clips/s; we use 0.01 (the
  favorable end) as the denominator.  Same estimate caveat as above —
  no CUDA GPU exists on this host to measure the reference.

Set EGOSCALER_BENCH_FULL=1 to measure ONLY the 80-frame arm (iteration);
default runs both.

Driver-timeout hardening (round 5, VERDICT r4 weak #4): the 80-frame
headline arm runs FIRST and its JSON line is printed the moment it
completes; the 16-frame arm then runs and the final combined line is
re-printed with both operating points.  A driver timeout mid-16f still
leaves a parseable headline line (round 4 lost both numbers to rc 124).
A persistent XLA compilation cache (.jax_cache/, gitignored) makes the
second process-level run skip the ~2-4 min of compiles.
"""
import json
import os
import sys
import time

import numpy as np


def enable_compile_cache():
    """Persistent compilation cache across bench invocations."""
    import jax

    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # cache is an optimization, never a failure
        print(f"compile cache unavailable: {e}", file=sys.stderr)


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


def timed_chain(label, fns, iters=5):
    """Median wall time for one CLIP: every stage program dispatched
    back-to-back (async), then ONE jitted reduction over all stage
    outputs fetched as a scalar.  The scalar VALUE depends on every
    stage's output, so the relay cannot ack before all stages execute
    (the bare block_until_ready early-ack hazard, CLAUDE.md) — this is
    the honest single-fetch latency of the full pipeline, paying the
    ~28 ms relay fetch overhead once instead of once per stage."""
    import jax
    import jax.numpy as jnp

    reduce_fn = jax.jit(lambda *xs: sum((jnp.sum(x) for x in xs), jnp.float32(0)))
    float(np.asarray(reduce_fn(*[f() for f in fns])).ravel()[0])  # warmup
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [f() for f in fns]
        float(np.asarray(reduce_fn(*outs)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"  {label}: {med * 1e3:.1f} ms", file=sys.stderr)
    return med


def timed_pipelined(label, fns, clips=8, iters=3):
    """Median per-clip wall time with CLIPS clips dispatched
    back-to-back before a single dependent-scalar fetch — the
    production regime: the reference's stage-7 driver loops over
    thousands of clips and only inspects results at the end
    (7_get_object_trajectory.py:63), so the host keeps the device fed
    instead of synchronizing per clip.  The fetched scalar depends on
    every stage program of every clip (the relay cannot ack early,
    same honesty argument as timed_chain); the fixed ~28 ms relay
    fetch overhead amortizes over the batch.  Device work per clip is
    unchanged — this hides only host/relay latency, not compute."""
    import jax
    import jax.numpy as jnp

    reduce_fn = jax.jit(
        lambda *xs: sum((jnp.sum(x) for x in xs), jnp.float32(0))
    )
    total_fn = jax.jit(lambda xs: jnp.sum(jnp.stack(xs)))
    float(np.asarray(
        total_fn([reduce_fn(*[f() for f in fns])])
    ).ravel()[0])  # warmup
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        scalars = [reduce_fn(*[f() for f in fns]) for _ in range(clips)]
        float(np.asarray(total_fn(scalars)).ravel()[0])
        ts.append((time.perf_counter() - t0) / clips)
    med = float(np.median(ts))
    print(f"  {label}: {med * 1e3:.1f} ms/clip", file=sys.stderr)
    return med


def timed(label, fn, iters=5):
    """Median of per-call SCALAR host fetches.  fn must return a scalar
    computed inside its jit: through the axon relay a bare
    block_until_ready can ack before execution and report garbage
    (CLAUDE.md), while a dependent scalar fetch cannot."""
    out = fn()
    assert np.asarray(out).size == 1, f"{label}: fn must return a scalar"
    float(np.asarray(out).ravel()[0])  # compile + warmup
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn()).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"  {label}: {med * 1e3:.1f} ms", file=sys.stderr)
    return med


def bench_registration(rng, t=16, h=384, w=384):
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.configs import DataConfig, PCMConfig
    from egoscaler_tpu.pipelines.trajectory import extract_trajectory

    frames, masks, tracks, f, pp = make_bench_clip(rng, t, h, w)
    cfg = DataConfig(pcm=PCMConfig(voxel_size=0.1))
    fj, mj, tj = jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(tracks)
    # max_keypoints right-sizes the fixed-shape padding to the scene:
    # every bench frame occupies <= ~1763 voxels at voxel 0.1 m, so a
    # 2048 cap drops ZERO points (trajectory identical to the 4096 cap
    # within 0.02 mm, measured) while halving every quadratic buffer —
    # the reference's Open3D clouds are exactly scene-sized too.
    kp = 2048
    ex = jax.jit(
        lambda fr, ma, tr: extract_trajectory(
            fr, ma, tr, jnp.asarray(t), f, pp, cfg=cfg,
            max_keypoints=kp, num_hypotheses=2048,
        )
    )
    res = ex(fj, mj, tj)
    assert bool(res.ok), "bench clip rejected by pipeline guards"
    exs = jax.jit(
        lambda fr, ma, tr: jnp.sum(
            extract_trajectory(
                fr, ma, tr, jnp.asarray(t), f, pp, cfg=cfg,
                max_keypoints=kp, num_hypotheses=2048,
            ).traj_quat
        )
    )
    return f"registration+trajectory ({t}fr)", lambda: exs(fj, mj, tj)


def bench_depth(rng, t=16, chunk=16):
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.models.depth_anything import (
        DepthAnythingConfig,
        DepthAnythingV2,
    )

    cfg = DepthAnythingConfig()  # ViT-L metric (the reference's model)
    model = DepthAnythingV2(cfg)
    x1 = jnp.zeros((1, 518, 518, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x1)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    params = jax.block_until_ready(params)
    frames = jnp.asarray(
        rng.normal(size=(t, 518, 518, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    if t > chunk:
        # 80-frame clips: a single batch-80 ViT-L forward holds ~5x the
        # 16-frame activation working set; map over batch-16 chunks
        # keeps peak HBM at the proven level (MXU stays saturated —
        # batch 16 already fills it at these shapes)
        assert t % chunk == 0, (t, chunk)
        frames = frames.reshape(t // chunk, chunk, 518, 518, 3)
        fwd = jax.jit(
            lambda p, x: jnp.sum(
                jax.lax.map(
                    lambda c: jnp.sum(model.apply(p, c).astype(jnp.float32)),
                    x,
                )
            )
        )
    else:
        fwd = jax.jit(
            lambda p, x: jnp.sum(model.apply(p, x).astype(jnp.float32))
        )
    return f"depth ViT-L x{t} frames", lambda: fwd(params, frames)


def bench_detector(rng):
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.models.grounding_dino import (
        GroundingDinoConfig,
        GroundingDinoForDetection,
        special_token_masks,
    )

    import dataclasses

    # bf16 end-to-end (TPU inference dtype; parity tests stay f32):
    # measured 238 -> 228 ms on the 800^2 forward
    cfg = dataclasses.replace(
        GroundingDinoConfig(), deformable_value_dtype="bfloat16"
    )  # Swin-B + BERT-base (grounding-dino-base)
    model = GroundingDinoForDetection(cfg)
    ids = np.array([[101, 2711, 1012, 2192, 1012, 3231, 1012, 102]], np.int32)
    self_masks, pos = special_token_masks(ids)
    img = jnp.asarray(
        rng.normal(size=(1, 800, 800, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    args = (
        img,
        jnp.asarray(ids),
        jnp.zeros_like(jnp.asarray(ids)),
        jnp.asarray((ids != 0)),
        jnp.asarray(self_masks),
        jnp.asarray(pos.astype(np.int32)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    params = jax.block_until_ready(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    )

    def fwd(p, *a):
        out = model.apply(p, *a)
        logits = jnp.where(jnp.isfinite(out["logits"]), out["logits"], 0.0)
        return jnp.sum(logits) + jnp.sum(out["pred_boxes"])

    jfwd = jax.jit(fwd)
    return "grounding-dino 800^2", lambda: jfwd(params, *args)


def bench_sam(rng):
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.models.sam import SamConfig, SamModel

    cfg = SamConfig.vit_h()
    model = SamModel(cfg)
    img = jnp.asarray(
        rng.normal(size=(1, 1024, 1024, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    boxes = jnp.asarray([[[200.0, 200.0, 700.0, 700.0]]])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, None, None, boxes)
    params = jax.block_until_ready(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    )
    def fwd(p, i, b):
        out = model.apply(p, i, None, None, b)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    jfwd = jax.jit(fwd)
    return "SAM ViT-H 1024^2", lambda: jfwd(params, img, boxes)


def bench_learned_tracker(rng, t=16, q=256):
    """The quality tracking path (reference runs learned SpaTracker,
    predictor.py:37-78): our trained window tracker over 3 sliding
    windows.  Returns None when the weight asset is absent."""
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.models.tracker import (
        SpaTracker,
        SpaTrackerPredictor,
        load_tracker_asset,
    )

    # bf16 inference params: post-occlusion quality identical to f32
    # (3.241 px on the held-out gate, measured on chip), ~6 ms faster
    asset = load_tracker_asset(dtype=jnp.bfloat16)
    if asset is None:
        return None
    cfg, params = asset
    pred = SpaTrackerPredictor(SpaTracker(cfg), params)

    h, w = 384, 512
    clip = jnp.asarray(rng.random((t, h, w, 3)).astype(np.float32))
    depths = jnp.asarray((1.0 + rng.random((t, h, w))).astype(np.float32))
    queries = jnp.asarray(
        np.stack(
            [rng.uniform(100, 400, q), rng.uniform(100, 300, q),
             1.0 + rng.random(q)], axis=1
        ).astype(np.float32)
    )

    def run():
        return jnp.sum(pred(clip, depths, queries))

    return f"learned tracker {t}fr x{q}pts", run


def bench_tracker(rng, t=16, q=256):
    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.ops.lucas_kanade import lk_track_clip, mask_query_points

    h, w = 384, 512
    clip = jnp.asarray(rng.normal(size=(t, h, w, 3)).astype(np.float32))
    depths = jnp.asarray(
        (1.0 + rng.random((t, h, w))).astype(np.float32)
    )
    mask = np.zeros((h, w), bool)
    mask[150:250, 200:320] = True
    pts, _ = mask_query_points(jnp.asarray(mask), q, jax.random.PRNGKey(0))
    track = jax.jit(lambda c, d, p: jnp.sum(lk_track_clip(c, d, p)))
    return f"LK tracker {t}fr x{q}pts", lambda: track(clip, depths, pts)


def run_regime(rng, t, q, clips=8):
    """Build + time the full 5-stage pipeline at a (frames, queries)
    operating point; returns the pipelined per-clip seconds."""
    print(f"bench stages ({t} frames, {q} queries):", file=sys.stderr)
    stages = [bench_registration(rng, t=t)]
    stages.append(bench_depth(rng, t=t))
    stages.append(bench_detector(rng))
    stages.append(bench_sam(rng))
    trk = bench_learned_tracker(rng, t=t, q=q)
    if trk is None:  # weight asset absent: weight-free LK fallback
        trk = bench_tracker(rng, t=t, q=q)
    stages.append(trk)
    for label, run in stages:  # per-stage breakdown (stderr only)
        timed(label, run, iters=3)
    timed_chain(
        f"FULL CLIP chained ({t}fr, one fetch)", [run for _, run in stages]
    )
    return timed_pipelined(
        f"PIPELINED x{clips} clips ({t}fr, one fetch)",
        [run for _, run in stages], clips=clips,
    )


def main():
    rng = np.random.default_rng(0)
    fast = os.environ.get("EGOSCALER_BENCH_FAST") == "1"
    full_only = os.environ.get("EGOSCALER_BENCH_FULL") == "1"
    enable_compile_cache()

    if fast:
        print("bench stages:", file=sys.stderr)
        label, run = bench_registration(rng)
        total = timed(label, run)
        clips_per_sec = 1.0 / total
        print(json.dumps({
            "metric": "registration_clips_per_sec_per_chip",
            "value": round(clips_per_sec, 3),
            "unit": "clips/s",
            "vs_baseline": round(clips_per_sec / 0.05, 2),
        }))
        return

    # denominators: documented literature estimates (module docstring) —
    # 16-frame window 0.05 clips/s; the reference's real 80-frame clip
    # 0.01 clips/s (79 Open3D pairs + 80 depth frames dominate).
    base_16f, base_80f = 0.05, 0.01

    # headline arm FIRST, emitted immediately (driver-timeout hardening)
    # 80-frame arm: 4 clips pipelined (each carries 5x the frames; 8x80f
    # inputs would approach the HBM budget without changing the answer)
    total_80f = run_regime(rng, t=80, q=800, clips=4)
    out = {
        "metric": "full_clip80_clips_per_sec_per_chip",
        "value": round(1.0 / total_80f, 3),
        "unit": "clips/s",
        "vs_baseline": round(1.0 / total_80f / base_80f, 2),
    }
    print(json.dumps(out), flush=True)

    if not full_only:
        total_16f = run_regime(rng, t=16, q=256)
        out["clips_per_sec_16f"] = round(1.0 / total_16f, 3)
        out["vs_baseline_16f"] = round(1.0 / total_16f / base_16f, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
