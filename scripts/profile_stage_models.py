"""Per-component profiling of the full-pipeline bench stages on TPU.

Times each sub-network of the heavy perception models separately so
optimization effort lands where the milliseconds are:

  * Grounding-DINO (bench: ~437 ms): Swin-B backbone, BERT text encoder,
    6 fusion+deformable encoder layers over ~13.3k multi-scale tokens,
    900-query decoder.
  * LK tracker (bench: ~355 ms / 16 frames).
  * Depth-Anything ViT-L (bench: ~421 ms / 16 frames): DINOv2 trunk vs
    DPT head.

Usage: python scripts/profile_stage_models.py [gdino] [lk] [depth]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(label, fn, iters=5):
    """Median of per-call SCALAR host fetches.  The timed fn must return
    a scalar computed inside its own jit (e.g. output.sum()): through
    the axon relay, bare block_until_ready on device arrays can ack
    before execution and report garbage (CLAUDE.md), while a dependent
    scalar fetch cannot."""
    out = fn()
    assert np.asarray(out).size == 1, f"{label}: fn must return a scalar"
    float(np.asarray(out).ravel()[0])  # warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn()).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"  {label}: {med * 1e3:.1f} ms", flush=True)
    return med


def bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, tree
    )


def profile_gdino(rng):
    from egoscaler_tpu.models.grounding_dino import (
        BertTextEncoder,
        EncoderLayer,
        DecoderLayer,
        GroundingDinoConfig,
        GroundingDinoForDetection,
        special_token_masks,
    )
    from egoscaler_tpu.models.swin import SwinBackbone

    cfg = GroundingDinoConfig()
    print("grounding-dino components:", flush=True)

    # Swin-B backbone at 800^2
    swin = SwinBackbone(cfg.backbone)
    img = jnp.asarray(rng.normal(size=(1, 800, 800, 3)).astype(np.float32))
    sp = bf16(jax.jit(swin.init)(jax.random.PRNGKey(0), img))
    sp = jax.block_until_ready(sp)
    sfwd = jax.jit(
        lambda p, x: sum(
            jnp.sum(o.astype(jnp.float32)) for o in swin.apply(p, x)
        )
    )
    timed("swin-b 800^2", lambda: sfwd(sp, img))

    # BERT text encoder (8 tokens)
    ids = np.array([[101, 2711, 1012, 2192, 1012, 3231, 1012, 102]], np.int32)
    self_masks, pos = special_token_masks(ids)
    bert = BertTextEncoder(cfg.text)
    bargs = (
        jnp.asarray(ids), jnp.asarray(self_masks),
        jnp.zeros_like(jnp.asarray(ids)), jnp.asarray(pos.astype(np.int32)),
    )
    bp = bf16(jax.jit(bert.init)(jax.random.PRNGKey(0), *bargs))
    bp = jax.block_until_ready(bp)
    bfwd = jax.jit(
        lambda p, *a: jnp.sum(bert.apply(p, *a).astype(jnp.float32))
    )
    timed("bert-base 8 tok", lambda: bfwd(bp, *bargs))

    # Encoder layer x6 over the multi-scale token set of an 800^2 image
    shapes = [(100, 100), (50, 50), (25, 25), (13, 13)]
    s = sum(h * w for h, w in shapes)
    lvl = len(shapes)
    d = cfg.d_model
    vision = jnp.asarray(rng.normal(size=(1, s, d)).astype(np.float32))
    text = jnp.asarray(rng.normal(size=(1, 8, d)).astype(np.float32))
    vpos = jnp.asarray(rng.normal(size=(1, s, d)).astype(np.float32))
    eref = jnp.ones((1, s, lvl, 2), jnp.float32) * 0.5
    tmask = jnp.asarray(ids != 0)
    layer = EncoderLayer(cfg)

    def enc_fwd(p, v, t):
        for _ in range(cfg.encoder_layers):
            v, t = layer.apply(p, v, t, vpos, shapes, eref, ~tmask,
                               jnp.asarray(self_masks),
                               jnp.asarray(pos.astype(np.int32)))
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(t.astype(jnp.float32))

    ep = bf16(layer.init(jax.random.PRNGKey(0), vision, text, vpos, shapes,
                         eref, ~tmask, jnp.asarray(self_masks),
                         jnp.asarray(pos.astype(np.int32))))
    ep = jax.block_until_ready(ep)
    jenc = jax.jit(enc_fwd)
    timed(f"encoder x{cfg.encoder_layers} (S={s})", lambda: jenc(ep, vision, text))

    # same params, bf16 deformable value (halved gather bytes)
    import dataclasses as _dc

    cfg_bf = _dc.replace(cfg, deformable_value_dtype="bfloat16")
    layer_bf = EncoderLayer(cfg_bf)

    def enc_fwd_bf(p, v, t):
        for _ in range(cfg.encoder_layers):
            v, t = layer_bf.apply(p, v, t, vpos, shapes, eref, ~tmask,
                                  jnp.asarray(self_masks),
                                  jnp.asarray(pos.astype(np.int32)))
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(t.astype(jnp.float32))

    jenc_bf = jax.jit(enc_fwd_bf)
    timed(f"encoder x{cfg.encoder_layers} bf16-value",
          lambda: jenc_bf(ep, vision, text))

    # Decoder layer x6 with 900 queries
    q = cfg.num_queries
    x = jnp.asarray(rng.normal(size=(1, q, d)).astype(np.float32))
    qpos = jnp.asarray(rng.normal(size=(1, q, d)).astype(np.float32))
    dref = jnp.ones((1, q, lvl, 4), jnp.float32) * 0.4
    tadd = jnp.zeros((1, cfg.decoder_attention_heads, q, 8), jnp.float32)
    dlayer = DecoderLayer(cfg)
    dp = bf16(dlayer.init(jax.random.PRNGKey(0), x, qpos, dref, shapes,
                          vision, text, tadd))
    dp = jax.block_until_ready(dp)

    def dec_fwd(p, xx):
        for _ in range(cfg.decoder_layers):
            xx = dlayer.apply(p, xx, qpos, dref, shapes, vision, text, tadd)
        return jnp.sum(xx.astype(jnp.float32))

    jdec = jax.jit(dec_fwd)
    timed(f"decoder x{cfg.decoder_layers} (Q={q})", lambda: jdec(dp, x))

    # whole model for reference
    model = GroundingDinoForDetection(cfg)
    args = (
        img, jnp.asarray(ids), jnp.zeros_like(jnp.asarray(ids)),
        jnp.asarray(ids != 0), jnp.asarray(self_masks),
        jnp.asarray(pos.astype(np.int32)),
    )
    params = bf16(jax.jit(model.init)(jax.random.PRNGKey(0), *args))
    params = jax.block_until_ready(params)
    def full_scalar(p, *a):
        out = model.apply(p, *a)
        logits = jnp.where(jnp.isfinite(out["logits"]), out["logits"], 0.0)
        return jnp.sum(logits) + jnp.sum(out["pred_boxes"])

    jfwd = jax.jit(full_scalar)
    timed("FULL grounding-dino", lambda: jfwd(params, *args))


def profile_lk(rng, t=16):
    from egoscaler_tpu.ops.lucas_kanade import lk_track_clip, mask_query_points

    h, w, q = 384, 512, 256
    clip = jnp.asarray(rng.normal(size=(t, h, w, 3)).astype(np.float32))
    depths = jnp.asarray((1.0 + rng.random((t, h, w))).astype(np.float32))
    mask = np.zeros((h, w), bool)
    mask[150:250, 200:320] = True
    pts, _ = mask_query_points(jnp.asarray(mask), q, jax.random.PRNGKey(0))
    print("LK tracker:", flush=True)
    for iters in (10, 5):
        track = jax.jit(
            lambda c, d, p: jnp.sum(lk_track_clip(c, d, p, iters=iters))
        )
        timed(f"lk 16fr x{q}pts iters={iters}",
              lambda: track(clip, depths, pts))


def profile_depth(rng, t=16):
    from egoscaler_tpu.models.depth_anything import (
        DPTHead,
        DepthAnythingConfig,
        DepthAnythingV2,
        DinoV2,
    )

    print("depth-anything:", flush=True)
    cfg = DepthAnythingConfig()
    model = DepthAnythingV2(cfg)
    x1 = jnp.zeros((1, 518, 518, 3), jnp.float32)
    params = bf16(jax.jit(model.init)(jax.random.PRNGKey(0), x1))
    params = jax.block_until_ready(params)
    frames = jnp.asarray(
        rng.normal(size=(t, 518, 518, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fwd = jax.jit(
        lambda p, x: jnp.sum(model.apply(p, x).astype(jnp.float32))
    )
    timed(f"FULL vit-l x{t}", lambda: fwd(params, frames))

    trunk = DinoV2(cfg)
    tp = bf16(trunk.init(jax.random.PRNGKey(0), x1))
    tp = jax.block_until_ready(tp)

    def trunk_scalar(p, x):
        outs, _ = trunk.apply(p, x)
        return sum(
            jnp.sum(a.astype(jnp.float32)) + jnp.sum(c.astype(jnp.float32))
            for a, c in outs
        )

    jtrunk = jax.jit(trunk_scalar)
    timed(f"dinov2 trunk x{t}", lambda: jtrunk(tp, frames))

    head = DPTHead(cfg)
    ph = 518 // cfg.patch_size
    feats = [
        (
            jnp.asarray(
                rng.normal(size=(t, ph * ph, cfg.embed_dim)).astype(np.float32)
            ).astype(jnp.bfloat16),
            jnp.zeros((t, cfg.embed_dim), jnp.bfloat16),
        )
        for _ in range(4)
    ]
    hp = bf16(head.init(jax.random.PRNGKey(0), feats, (ph, ph)))
    hp = jax.block_until_ready(hp)
    jhead = jax.jit(
        lambda p, f: jnp.sum(head.apply(p, f, (ph, ph)).astype(jnp.float32))
    )
    timed(f"dpt head x{t}", lambda: jhead(hp, feats))


def profile_tracker(rng, t=16):
    import dataclasses as _dc
    import os

    from flax import traverse_util

    from egoscaler_tpu.models.tracker import (
        SpaTracker,
        SpaTrackerPredictor,
        TrackerConfig,
    )

    print("learned tracker:", flush=True)
    from egoscaler_tpu.models.tracker import load_tracker_asset

    cfg, params = load_tracker_asset()
    model = SpaTracker(cfg)
    h, w, q = 384, 512, 256
    clip = jnp.asarray(
        rng.random((t, h, w, 3)).astype(np.float32)
    )
    depths = jnp.asarray((1.0 + rng.random((t, h, w))).astype(np.float32))
    queries = jnp.asarray(
        np.stack(
            [rng.uniform(100, 400, q), rng.uniform(100, 300, q),
             1.0 + rng.random(q)], axis=1
        ).astype(np.float32)
    )
    # one window, jitted scalar
    jwin = jax.jit(
        lambda p, c, d, qq: jnp.sum(model.apply(p, c, d, qq)[0])
    )
    w8 = cfg.window
    timed(
        f"window tracker {w8}fr x{q}pts",
        lambda: jwin(params, clip[:w8], depths[:w8], queries),
    )
    # full clip through the sliding-window predictor (host loop)
    pred = SpaTrackerPredictor(model, params)

    def full():
        out = pred(clip, depths, queries)
        return jnp.sum(out)

    timed(f"predictor {t}fr x{q}pts (3 windows)", full)


def profile_sam(rng):
    from egoscaler_tpu.models.sam import SamConfig, SamModel

    print("SAM:", flush=True)
    cfg = SamConfig.vit_h()
    model = SamModel(cfg)
    img = jnp.asarray(rng.normal(size=(1, 1024, 1024, 3)).astype(np.float32))
    boxes = jnp.asarray([[[200.0, 200.0, 700.0, 700.0]]])
    params = bf16(jax.jit(model.init)(jax.random.PRNGKey(0), img, None, None, boxes))
    params = jax.block_until_ready(params)

    def scalar(p, i, b):
        out = model.apply(p, i, None, None, b)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    jfwd = jax.jit(scalar)
    timed("SAM ViT-H 1024^2", lambda: jfwd(params, img, boxes))


def profile_reg(rng, t=16, h=384, w=384):
    from egoscaler_tpu.configs import DataConfig, PCMConfig
    from egoscaler_tpu.pipelines.trajectory import extract_trajectory

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    print("registration:", flush=True)
    frames, masks, tracks, f, pp = bench_mod.make_bench_clip(rng, t, h, w)
    cfg = DataConfig(pcm=PCMConfig(voxel_size=0.1))
    fj, mj, tj = jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(tracks)
    ex = jax.jit(
        lambda fr, ma, tr: jnp.sum(
            extract_trajectory(
                fr, ma, tr, jnp.asarray(t), f, pp, cfg=cfg,
                max_keypoints=4096, num_hypotheses=2048,
            ).traj_quat
        )
    )
    timed("registration+trajectory (16fr)", lambda: ex(fj, mj, tj))


def main():
    which = set(sys.argv[1:]) or {
        "gdino", "lk", "depth", "tracker", "sam", "reg"
    }
    rng = np.random.default_rng(0)
    if "gdino" in which:
        profile_gdino(rng)
    if "lk" in which:
        profile_lk(rng)
    if "depth" in which:
        profile_depth(rng)
    if "tracker" in which:
        profile_tracker(rng)
    if "sam" in which:
        profile_sam(rng)
    if "reg" in which:
        profile_reg(rng)


if __name__ == "__main__":
    main()
