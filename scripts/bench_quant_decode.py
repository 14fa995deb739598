"""Decode throughput: bf16 vs int8 weight-only (Pallas w8a16 kernel).

Single-token decode is parameter-bandwidth bound (PARITY.md: 1.1B bs8
5.78 ms/step vs ~2.8 ms bf16 streaming roofline; 7B streams 12.6 GiB
per step).  ops/quant_matmul.py stores the projections + lm_head as
int8 with per-channel scales and converts in VMEM, halving the per-step
weight traffic.  This script measures both paths with the honest
protocol (per-call dependent output fetch medians, CLAUDE.md).

Harness discipline (round-5 fix): every jitted generate is built and
compiled ONCE per configuration, *before* its timing loop.  The round-4
version constructed a fresh ``jax.jit`` wrapper inside the loop, so each
iteration retraced and recompiled — its flagship "timings" were
compile-time measurements (bf16 29,130 ms vs the correctly-hoisted
601.73 ms in SPECULATIVE_BENCH.json for the identical program).

Decode/prefill isolation (--decode_iso, default on): each arm is also
timed at a short generation length and differenced, so the report
carries decode-only ms/token and tok/s (whole-generate ms_per_step
divides prefill cost over tokens and understates every arm).

Quality: with --ckpt (a trained flagship tree from
scripts/train_flagship_grounding.py --save_dir), greedy token agreement
and held-out val ADE are reported for bf16 vs int8; without it, weights
are random (timing valid — traffic is weight-independent — quality
numbers meaningless and skipped).  Under --size 7b the AOT auto-layout
path deletes source buffers during relayout, so the quality section is
skipped there (ADVICE r4: the old code would touch deleted jax.Arrays).

Writes QUANT_BENCH.json at the repo root.

Reference surface: models/pointllm/evaluate.py:84-154 (the reference's
batch generate loop — fp16 torch, no quantized serving path at all).
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed_tokens(label, fn, params, iters=5):
    """Median wall seconds for one call of an already-jitted token fn.

    The full token array is fetched to host each call — the fetched
    VALUES depend on every decode step, so the relay cannot ack early
    (CLAUDE.md honesty rule).  First call compiles; returns
    (median_s, tokens ndarray from the warmup call).
    """
    import jax

    t0 = time.perf_counter()
    toks = np.asarray(jax.device_get(fn(params)))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(params)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"  {label}: {med * 1e3:.1f} ms (compile+warmup {compile_s:.1f} s)",
          file=sys.stderr, flush=True)
    return med, toks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["flagship", "7b"], default="flagship")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke test")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--gen_tokens", type=int, default=0,
                    help="0 = dataset answer length")
    ap.add_argument("--ckpt", default="",
                    help="trained flagship best_params.npz for quality")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--kv8", action="store_true",
                    help="also measure the int8 KV cache (Pallas "
                         "flash-decode, ops/kv8_attention.py): bf16 "
                         "weights + int8 cache isolates the cache win; "
                         "int8 weights + int8 cache is the full "
                         "composition")
    ap.add_argument("--decode_iso", type=int, default=1,
                    help="1 = difference a short-generation run out of "
                         "each arm to report decode-only ms/token "
                         "(doubles compiles; auto-off for --size 7b)")
    ap.add_argument("--short_tokens", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(ROOT, "QUANT_BENCH.json"))
    args = ap.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.pointllm import (
        GenerateConfig, TrajPointLLM, generate,
    )
    from egoscaler_tpu.models.quantize import (
        quantize_decode_params, quantized_param_bytes,
    )
    from egoscaler_tpu.runtime.params import leafwise_bf16_params
    from egoscaler_tpu.training.dataset import BatchLayout

    if args.tiny:
        cfg = PointLLMConfig().tiny()
    elif args.size == "flagship":
        cfg = PointLLMConfig().flagship_tpu()
    else:
        cfg = PointLLMConfig()
    lay = BatchLayout(cfg)
    bs = args.bs
    new_tokens = args.gen_tokens or lay.answer_len
    short = min(args.short_tokens, max(new_tokens // 4, 1))
    gen = GenerateConfig(max_new_tokens=new_tokens, do_sample=False)
    gen_s = GenerateConfig(max_new_tokens=short, do_sample=False)

    ids1 = np.full((1, lay.prompt_len), 5, np.int32)
    ids1[0, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    ids1[0, 0] = cfg.point_start_token_id
    ids = jnp.asarray(np.tile(ids1, (bs, 1)))
    mask = jnp.ones((bs, lay.prompt_len), bool)
    pc = jnp.zeros((bs, cfg.point_bert.npoints, 6), jnp.float32)
    key = jax.random.PRNGKey(0)

    use_auto = args.size == "7b" and not args.tiny
    decode_iso = bool(args.decode_iso) and not use_auto
    trained = bool(args.ckpt) and os.path.exists(args.ckpt)
    results = {
        "size": "tiny" if args.tiny else args.size,
        "batch_size": bs,
        "new_tokens": new_tokens,
        "trained_ckpt": trained,
        "device": str(jax.devices()[0]),
    }
    if decode_iso:
        results["short_tokens"] = short

    def variant_cfg(weight=None, kv=None):
        return dataclasses.replace(
            cfg, llama=dataclasses.replace(
                cfg.llama, weight_quant=weight, kv_quant=kv
            )
        )

    def build_token_fn(model, g):
        """ONE jit per (model config, generation length) — hoisted out of
        all timing loops (the round-4 in-loop construction measured
        compile, not decode)."""
        return jax.jit(lambda p: generate(model, p, ids, mask, pc, key, g)[0])

    def measure_arm(name, model, params):
        """Time whole-generate (+ optional short run differencing)."""
        fn = build_token_fn(model, gen)
        t_full, toks = timed_tokens(
            f"{name} generate bs{bs} x{new_tokens}", fn, params,
            iters=args.iters,
        )
        rec = {
            "ms": round(t_full * 1e3, 1),
            "tok_s": round(bs * new_tokens / t_full, 1),
            "ms_per_step": round(t_full * 1e3 / new_tokens, 3),
        }
        if decode_iso:
            fn_s = build_token_fn(model, gen_s)
            t_short, _ = timed_tokens(
                f"{name} generate bs{bs} x{short}", fn_s, params,
                iters=args.iters,
            )
            per_tok = (t_full - t_short) / (new_tokens - short)
            rec["decode_ms_per_tok"] = round(per_tok * 1e3, 3)
            rec["decode_tok_s"] = round(bs / per_tok, 1)
            rec["prefill_ms"] = round(
                (t_short - short * per_tok) * 1e3, 1
            )
        return rec, toks, fn

    # ---- params
    model = TrajPointLLM(cfg, remat=False)
    qmodel = TrajPointLLM(variant_cfg(weight="int8"), remat=False)
    if trained:
        from flax import traverse_util

        with np.load(args.ckpt) as z:
            flat = {k: jnp.asarray(z[k], jnp.bfloat16) for k in z.files}
        params = traverse_util.unflatten_dict(flat, sep="/")
        print(f"loaded trained params from {args.ckpt}", flush=True)
    else:
        print("materializing random bf16 params on device ...", flush=True)
        params = leafwise_bf16_params(model, ids[:1], pc[:1])

    bf16_gib = quantized_param_bytes(params) / 2**30
    results["bf16_params_gib"] = round(bf16_gib, 3)

    toks_bf16 = None
    if use_auto:
        # 12.6 GiB params: default layouts OOM on in-program transposed
        # weight copies (run_7b_chip.py) — AUTO input layouts.  Sources
        # are deleted leaf-by-leaf during relayout (peak extra HBM = one
        # leaf), so the trained-quality section is unavailable here.
        from egoscaler_tpu.runtime.layouts import (
            compile_with_auto_layouts, relayout_tree,
        )

        print("compiling 7B bf16 generate (auto layouts) ...", flush=True)
        compiled, fmts = compile_with_auto_layouts(
            lambda p: generate(model, p, ids, mask, pc, key, gen)[0], params
        )
        params_l = relayout_tree(params, fmts[0])
        t_bf16, _ = timed_tokens(f"bf16 generate bs{bs} x{new_tokens}",
                                 compiled, params_l, iters=args.iters)
        del params_l
        results["bf16"] = {
            "ms": round(t_bf16 * 1e3, 1),
            "tok_s": round(bs * new_tokens / t_bf16, 1),
            "ms_per_step": round(t_bf16 * 1e3 / new_tokens, 3),
        }
    else:
        results["bf16"], toks_bf16, _ = measure_arm("bf16", model, params)
        t_bf16 = results["bf16"]["ms"] / 1e3

    # ---- KV8 with bf16 weights (isolates the cache-stream win;
    # needs the bf16 tree, so it runs before that tree is freed)
    if args.kv8 and not use_auto:
        kv8model = TrajPointLLM(variant_cfg(kv="int8"), remat=False)
        results["bf16_kv8"], toks_kv8, _ = measure_arm(
            "bf16+KV8", kv8model, params
        )
        results["bf16_kv8"]["speedup_vs_bf16"] = round(
            t_bf16 / (results["bf16_kv8"]["ms"] / 1e3), 3
        )
        if trained:
            results["bf16_kv8"]["greedy_token_agreement"] = round(
                float((toks_bf16 == toks_kv8).mean()), 4
            )

    # ---- int8
    print("quantizing / materializing int8 params ...", flush=True)
    if trained and not use_auto:
        qparams = jax.jit(quantize_decode_params)(params)
    else:
        # free the bf16 tree first (7B: 12.6 + 6.7 GiB would not coexist)
        for leaf in jax.tree_util.tree_leaves(params):
            if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                leaf.delete()
        qparams = leafwise_bf16_params(qmodel, ids[:1], pc[:1])
    int8_gib = quantized_param_bytes(qparams) / 2**30
    results["int8_params_gib"] = round(int8_gib, 3)

    if use_auto:
        # same treatment as the bf16 arm: without AUTO input layouts the
        # 7B decode inserts in-program transposed copies of every weight
        # each step (measured 0.118x vs bf16 — the copies, not the
        # kernel, dominate)
        print("compiling 7B int8 generate (auto layouts) ...", flush=True)
        compiled_q, fmts_q = compile_with_auto_layouts(
            lambda p: generate(qmodel, p, ids, mask, pc, key, gen)[0], qparams
        )
        qparams = relayout_tree(qparams, fmts_q[0])
        t_int8, _ = timed_tokens(f"int8 generate bs{bs} x{new_tokens}",
                                 compiled_q, qparams, iters=args.iters)
        results["int8"] = {
            "ms": round(t_int8 * 1e3, 1),
            "tok_s": round(bs * new_tokens / t_int8, 1),
            "ms_per_step": round(t_int8 * 1e3 / new_tokens, 3),
        }
    else:
        results["int8"], toks_int8, _ = measure_arm("int8", qmodel, qparams)
        t_int8 = results["int8"]["ms"] / 1e3
    results["speedup"] = round(t_bf16 / t_int8, 3)

    # ---- int8 weights + int8 KV cache (the full serving composition)
    if args.kv8 and not use_auto:
        qkv8model = TrajPointLLM(
            variant_cfg(weight="int8", kv="int8"), remat=False
        )
        results["int8_kv8"], toks_qkv8, _ = measure_arm(
            "int8+KV8", qkv8model, qparams
        )
        results["int8_kv8"]["speedup_vs_bf16"] = round(
            t_bf16 / (results["int8_kv8"]["ms"] / 1e3), 3
        )
        results["int8_kv8"]["speedup_vs_int8"] = round(
            t_int8 / (results["int8_kv8"]["ms"] / 1e3), 3
        )
        if trained:
            results["int8_kv8"]["greedy_token_agreement"] = round(
                float((toks_bf16 == toks_qkv8).mean()), 4
            )
            # diagnostic for the r4 oddity (int8_kv8 agreement == int8
            # agreement to 4 dp): is the KV8 cache a token-level no-op
            # on top of int8 weights?
            results["int8_kv8"]["tokens_equal_int8_plain"] = bool(
                (toks_int8 == toks_qkv8).all()
            )

    if trained and not use_auto:
        agree = float((toks_bf16 == toks_int8).mean())
        results["greedy_token_agreement"] = round(agree, 4)

        from egoscaler_tpu.training.dataset import (
            TrajectoryDataset, synthetic_structured_samples,
        )
        from egoscaler_tpu.training.evaluate import evaluate

        val_s = synthetic_structured_samples(cfg, 64, seed=10_000)
        vds = TrajectoryDataset(cfg, samples=val_s, seed=1)
        m_bf16 = evaluate(model, params, vds, batch_size=bs,
                          do_sample=False)
        m_int8 = evaluate(qmodel, qparams, vds, batch_size=bs,
                          do_sample=False)
        results["val_bf16"] = {k: round(float(v), 4)
                               for k, v in m_bf16.items()}
        results["val_int8"] = {k: round(float(v), 4)
                               for k, v in m_int8.items()}
        print(f"agreement {agree:.4f}; ADE bf16 "
              f"{m_bf16.get('ade'):.4f} vs int8 {m_int8.get('ade'):.4f}",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: results[k] for k in
                      ("size", "bf16", "int8", "speedup")}), flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
