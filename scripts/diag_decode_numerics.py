"""Root-cause diagnostics: speculative non-exactness + KV8 disagreement.

VERDICT r4 items 4-5.  Two facts needed explanation:

1. `speculative_generate` promised token-exactness vs plain greedy
   (serving/speculative.py) but SPECULATIVE_BENCH.json recorded
   `token_exact_vs_baseline: false` at every k in bf16, while the int8
   arms were exact vs their own baseline.
   Hypothesis: the (k+1)-token verify forward and the 1-token decode
   forward hit different XLA matmul tilings for the bf16 Dense layers
   (M=B*(k+1) vs M=B), whose different accumulation splits give
   epsilon-different logits that flip near-tied argmaxes.  The int8 arm
   is exact because the Pallas w8a16 kernel accumulates over K in the
   same block order regardless of M — shape-invariant numerics.

2. bf16+KV8 greedy agreement 0.43 vs bf16 while the KV8 kernel matches
   its dequant oracle to 0.002, and int8+KV8 agreement (0.8881) equals
   plain-int8 agreement to 4 dp.
   Hypothesis: per-step argmax flips from cache quantization error
   compound over 134 autoregressive steps (one flip re-contexts every
   later token); the positional agreement then decays roughly like
   (1 - p_flip)^t even for small per-step flip rates.

Method: TEACHER-FORCED comparisons (no compounding) — feed the bf16
baseline's own greedy tokens through (a) 1-token decode_step scans,
(b) (k+1)-token decode_chunk scans, (c) the KV8-cache decode — and
compare per-position argmax + top-2 logit gaps at flip positions.
Also decodes token streams to trajectories to quantify task-level (ADE)
impact, and tests whether int8+KV8 generate is token-identical to
plain int8 (the 0.8881 == 0.8881 oddity).

Writes DIAG_DECODE.json at the repo root.

Reference role: the reference has no serving/quantization stack; its
generate is HF fp16 `model.generate` (models/pointllm/evaluate.py:84-154).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke test")
    ap.add_argument("--ckpt", default=os.path.join(
        ROOT, "GROUNDING_CKPT", "best_params.npz"))
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=7,
                    help="verify-chunk width (k+1 for the k=6 spec arm)")
    ap.add_argument("--kv8", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="also check int8+KV8 generate == int8 generate")
    ap.add_argument("--out", default=os.path.join(ROOT, "DIAG_DECODE.json"))
    args = ap.parse_args()

    import dataclasses

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import traverse_util

    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.llama import init_kv_cache
    from egoscaler_tpu.models.pointllm import (
        GenerateConfig, TrajPointLLM, generate,
    )
    from egoscaler_tpu.serving.speculative import speculative_generate
    from egoscaler_tpu.training.dataset import (
        BatchLayout, TrajectoryDataset, synthetic_structured_samples,
    )

    cfg = PointLLMConfig().tiny() if args.tiny else (
        PointLLMConfig().flagship_tpu())
    lay = BatchLayout(cfg)
    model = TrajPointLLM(cfg, remat=False)
    p_len = lay.prompt_len
    max_new = lay.answer_len
    gen = GenerateConfig(max_new_tokens=max_new, do_sample=False)

    val_s = synthetic_structured_samples(cfg, args.bs, seed=31_000)
    vds = TrajectoryDataset(cfg, samples=val_s, seed=5)
    ex = next(vds.batches(args.bs, shuffle=False))
    prompt = jnp.asarray(ex["input_ids"][:, :p_len])
    pmask = jnp.asarray(ex["attention_mask"][:, :p_len].astype(bool))
    pcs = jnp.asarray(ex["point_clouds"])
    gt = np.asarray(ex["gt_traj"])

    trained = os.path.exists(args.ckpt) and not args.tiny
    if trained:
        with np.load(args.ckpt) as z:
            flat = {k: jnp.asarray(z[k], jnp.bfloat16) for k in z.files}
        params = traverse_util.unflatten_dict(flat, sep="/")
        print(f"loaded {args.ckpt}", flush=True)
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), prompt[:1],
                                     pcs[:1])
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        print("WARNING: random init (untrained diagnostics)", flush=True)

    b = prompt.shape[0]
    t_steps = max_new - 1  # teacher tokens fed (the last is never fed)

    def stats_of(logits):
        v2 = jax.lax.top_k(logits.astype(jnp.float32), 2)[0]
        return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                v2[..., 0] - v2[..., 1])

    def stepped_run(m):
        """Teacher-forced 1-token decode scan -> per-position argmax/gap."""
        t_max = p_len + max_new  # same cache size as generate()

        def run(p, teacher):
            cache = init_kv_cache(m.cfg.llama, b, t_max)
            full_mask = jnp.concatenate(
                [pmask, jnp.ones((b, max_new), bool)], axis=1)
            logits0, cache = m.apply(p, prompt, pcs, full_mask, cache,
                                     method=TrajPointLLM.prefill)
            a0, g0 = stats_of(logits0)

            def step(cache, i):
                logits, cache = m.apply(
                    p, teacher[:, i], p_len + i, full_mask, cache,
                    method=TrajPointLLM.decode_step)
                return cache, stats_of(logits)

            _, (aa, gg) = jax.lax.scan(step, cache,
                                       jnp.arange(t_steps, dtype=jnp.int32))
            preds = jnp.concatenate([a0[None], aa], axis=0)  # (T, B)
            gaps = jnp.concatenate([g0[None], gg], axis=0)
            return preds.T, gaps.T  # (B, T)

        return jax.jit(run)

    def chunked_run(m, c):
        """Teacher-forced decode_chunk scan (the spec verify forward)."""
        nch = -(-t_steps // c)
        t_max = p_len + 1 + nch * c

        def run(p, teacher):
            cache = init_kv_cache(m.cfg.llama, b, t_max)
            full_mask = jnp.concatenate(
                [pmask, jnp.ones((b, t_max - p_len), bool)], axis=1)
            logits0, cache = m.apply(p, prompt, pcs, full_mask, cache,
                                     method=TrajPointLLM.prefill)
            a0, g0 = stats_of(logits0)
            pad = jnp.full((b, nch * c - t_steps), gen.eos_token_id,
                           jnp.int32)
            teach = jnp.concatenate([teacher[:, :t_steps], pad], axis=1)

            def step(cache, j):
                toks = jax.lax.dynamic_slice(teach, (0, j * c), (b, c))
                n = jnp.full((b,), p_len, jnp.int32) + j * c
                logits, cache = m.apply(
                    p, toks, n, full_mask, cache,
                    method=TrajPointLLM.decode_chunk)
                return cache, stats_of(logits)  # (B, c) each

            _, (aa, gg) = jax.lax.scan(step, cache,
                                       jnp.arange(nch, dtype=jnp.int32))
            # (nch, B, c) -> (B, nch*c) -> prepend prefill position
            aa = jnp.swapaxes(aa, 0, 1).reshape(b, nch * c)
            gg = jnp.swapaxes(gg, 0, 1).reshape(b, nch * c)
            preds = jnp.concatenate([a0[:, None], aa[:, :t_steps]], axis=1)
            gaps = jnp.concatenate([g0[:, None], gg[:, :t_steps]], axis=1)
            return preds, gaps  # (B, T)

        return jax.jit(run)

    # ---- baseline greedy generate
    t0 = time.time()
    gen_fn = jax.jit(lambda p: generate(model, p, prompt, pmask, pcs,
                                        jax.random.PRNGKey(2), gen))
    base_toks, base_lens = jax.device_get(gen_fn(params))
    base_toks = np.asarray(base_toks)
    lens = np.asarray(base_lens)
    teacher = jnp.asarray(base_toks)
    # position i is "live" for row r if i <= eos index (post-eos tokens
    # are forced pads in generate and meaningless to compare)
    valid = (np.arange(max_new)[None, :] <= lens[:, None])
    print(f"baseline generate done ({time.time() - t0:.0f}s); "
          f"lens {lens.tolist()}", flush=True)

    results = {
        "model": "tiny" if args.tiny else "flagship_tpu 1.1B",
        "trained_ckpt": bool(trained),
        "batch": int(b),
        "max_new_tokens": int(max_new),
        "chunk": int(args.chunk),
        "device": str(jax.devices()[0]),
    }

    def flip_report(pred_a, gap_a, pred_b, gap_b, name):
        """pred/gap (B, T); compares argmax streams on valid positions."""
        agree = (pred_a == pred_b) & valid
        n_valid = int(valid.sum())
        n_flip = int((~(pred_a == pred_b) & valid).sum())
        flips = (~(pred_a == pred_b)) & valid
        gaps_at_flips = np.asarray(gap_a)[flips]
        first = []
        for r in range(b):
            w = np.nonzero(flips[r])[0]
            first.append(int(w[0]) if w.size else -1)
        rep = {
            "positions_compared": n_valid,
            "flips": n_flip,
            "flip_rate": round(n_flip / max(n_valid, 1), 5),
            "agreement": round(int(agree.sum()) / max(n_valid, 1), 5),
            "first_flip_per_row": first,
            "gap_at_flips_median": round(
                float(np.median(gaps_at_flips)), 5) if n_flip else None,
            "gap_at_flips_p90": round(
                float(np.quantile(gaps_at_flips, 0.9)), 5) if n_flip else None,
            "gap_at_flips_max": round(
                float(gaps_at_flips.max()), 5) if n_flip else None,
            "gap_overall_median": round(
                float(np.median(np.asarray(gap_a)[valid])), 5),
        }
        print(f"{name}: {json.dumps(rep)[:300]}", flush=True)
        return rep

    # ---- (a) stepped teacher-forced (sanity: must match base_toks)
    sf = stepped_run(model)
    pred_s, gap_s = jax.device_get(sf(params, teacher))
    pred_s, gap_s = np.asarray(pred_s), np.asarray(gap_s)
    sanity = (pred_s == base_toks) | ~valid
    results["stepped_sanity_agreement"] = round(
        float(sanity[valid].mean() if valid.any() else 1.0), 5)
    print(f"stepped vs generate sanity: "
          f"{results['stepped_sanity_agreement']}", flush=True)

    # ---- (b) chunked (verify-forward) teacher-forced
    cf = chunked_run(model, args.chunk)
    pred_c, gap_c = jax.device_get(cf(params, teacher))
    pred_c, gap_c = np.asarray(pred_c), np.asarray(gap_c)
    results["chunk_vs_step"] = flip_report(
        pred_s, gap_s, pred_c, gap_c, "chunk_vs_step")

    # ---- (c) end-to-end speculative + trajectory impact
    k = args.chunk - 1
    spec_fn = jax.jit(lambda p, dp: speculative_generate(
        model, p, model, dp, prompt, pmask, pcs, gen, k=k))
    # draft = target itself: acceptance ~ perfect, which maximizes
    # chunked-verify exposure (every token comes from a verify forward)
    spec_toks, spec_lens, _ = jax.device_get(spec_fn(params, params))
    spec_toks = np.asarray(spec_toks)
    tok_agree = float(((spec_toks == base_toks) & valid).sum()
                      / max(valid.sum(), 1))
    results["spec_selfdraft_token_agreement"] = round(tok_agree, 5)

    def decode_trajs(toks):
        prompt_np = np.asarray(prompt)
        out = []
        for r in range(b):
            full = np.concatenate([prompt_np[r, -8:], toks[r]])
            tr = vds.detokenize_traj(full)
            out.append(tr)
        return out

    base_tr, spec_tr = decode_trajs(base_toks), decode_trajs(spec_toks)
    deltas, ade_b, ade_s = [], [], []
    for r in range(b):
        if base_tr[r] is None or spec_tr[r] is None:
            continue
        n = min(len(base_tr[r]), len(spec_tr[r]))
        deltas.append(float(np.linalg.norm(
            base_tr[r][:n, :3] - spec_tr[r][:n, :3], axis=1).mean()))
        g = gt[r]
        for tr, acc in ((base_tr[r], ade_b), (spec_tr[r], ade_s)):
            m = min(len(tr), len(g))
            acc.append(float(np.linalg.norm(
                tr[:m, :3] - g[:m, :3], axis=1).mean()))
    results["spec_traj_delta_m"] = round(float(np.mean(deltas)), 6) \
        if deltas else None
    results["ade_base"] = round(float(np.mean(ade_b)), 5) if ade_b else None
    results["ade_spec"] = round(float(np.mean(ade_s)), 5) if ade_s else None
    print(f"spec self-draft agreement {tok_agree:.4f}, traj delta "
          f"{results['spec_traj_delta_m']} m, ADE base/spec "
          f"{results['ade_base']}/{results['ade_spec']}", flush=True)

    # ---- (d) KV8 teacher-forced + end-to-end
    if args.kv8:
        kv8cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, kv_quant="int8"))
        kv8model = TrajPointLLM(kv8cfg, remat=False)
        kf = stepped_run(kv8model)
        pred_k, gap_k = jax.device_get(kf(params, teacher))
        pred_k, gap_k = np.asarray(pred_k), np.asarray(gap_k)
        results["kv8_vs_bf16_teacher_forced"] = flip_report(
            pred_s, gap_s, pred_k, gap_k, "kv8_vs_step")
        p_flip = results["kv8_vs_bf16_teacher_forced"]["flip_rate"]
        results["kv8_expected_e2e_agreement_if_compounding"] = round(
            float(np.mean((1.0 - p_flip) ** np.arange(1, max_new + 1))), 4)
        kgen_fn = jax.jit(lambda p: generate(
            kv8model, p, prompt, pmask, pcs, jax.random.PRNGKey(2), gen))
        kv8_toks, _ = jax.device_get(kgen_fn(params))
        results["kv8_e2e_agreement"] = round(float(
            ((np.asarray(kv8_toks) == base_toks) & valid).sum()
            / max(valid.sum(), 1)), 4)
        # traj impact of KV8
        kv8_tr = decode_trajs(np.asarray(kv8_toks))
        ade_k = []
        for r in range(b):
            if kv8_tr[r] is None:
                continue
            g = gt[r]
            m = min(len(kv8_tr[r]), len(g))
            ade_k.append(float(np.linalg.norm(
                kv8_tr[r][:m, :3] - g[:m, :3], axis=1).mean()))
        results["ade_kv8"] = round(float(np.mean(ade_k)), 5) if ade_k else None
        print(f"KV8 e2e agreement {results['kv8_e2e_agreement']} "
              f"(compounding model predicts "
              f"{results['kv8_expected_e2e_agreement_if_compounding']}); "
              f"ADE kv8 {results['ade_kv8']}", flush=True)

    # ---- (e) int8+KV8 == int8?  (the 0.8881 == 0.8881 oddity)
    if args.int8:
        from egoscaler_tpu.models.quantize import quantize_decode_params

        qcfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8"))
        qkcfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(
                cfg.llama, weight_quant="int8", kv_quant="int8"))
        qmodel = TrajPointLLM(qcfg, remat=False)
        qkmodel = TrajPointLLM(qkcfg, remat=False)
        qparams = jax.jit(quantize_decode_params)(params)
        qg = jax.jit(lambda p: generate(qmodel, p, prompt, pmask, pcs,
                                        jax.random.PRNGKey(2), gen))
        qkg = jax.jit(lambda p: generate(qkmodel, p, prompt, pmask, pcs,
                                         jax.random.PRNGKey(2), gen))
        q_toks, _ = jax.device_get(qg(qparams))
        qk_toks, _ = jax.device_get(qkg(qparams))
        results["int8kv8_equals_int8"] = bool(
            (np.asarray(q_toks) == np.asarray(qk_toks)).all())
        results["int8_vs_bf16_agreement"] = round(float(
            ((np.asarray(q_toks) == base_toks) & valid).sum()
            / max(valid.sum(), 1)), 4)
        results["int8kv8_vs_bf16_agreement"] = round(float(
            ((np.asarray(qk_toks) == base_toks) & valid).sum()
            / max(valid.sum(), 1)), 4)
        print(f"int8+kv8 == int8: {results['int8kv8_equals_int8']}",
              flush=True)

    results["wall_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
