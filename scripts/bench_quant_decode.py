"""Decode throughput: bf16 vs int8 weight-only (Pallas w8a16 kernel).

Single-token decode is parameter-bandwidth bound (PARITY.md: 1.1B bs8
5.78 ms/step vs ~2.8 ms bf16 streaming roofline; 7B streams 12.6 GiB
per step).  ops/quant_matmul.py stores the projections + lm_head as
int8 with per-channel scales and converts in VMEM, halving the per-step
weight traffic.  This script measures both paths with the honest
protocol (per-call dependent-scalar fetch medians, CLAUDE.md).

Quality: with --ckpt (a trained flagship tree from
scripts/train_flagship_grounding.py --save_dir), greedy token agreement
and held-out val ADE are reported for bf16 vs int8; without it, weights
are random (timing valid — traffic is weight-independent — quality
numbers meaningless and skipped).

Writes QUANT_BENCH.json at the repo root.
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


def fetch_scalar(x) -> float:
    return float(np.asarray(x).ravel()[0])


def timed(label, fn, iters=5):
    fetch_scalar(fn())  # compile + warmup
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch_scalar(fn())
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"  {label}: {med * 1e3:.1f} ms", file=sys.stderr, flush=True)
    return med


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
    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8")
    )
    lay = BatchLayout(cfg)
    bs = args.bs
    new_tokens = args.gen_tokens or lay.answer_len
    gen = GenerateConfig(max_new_tokens=new_tokens, do_sample=False)

    ids1 = np.full((1, lay.prompt_len), 5, np.int32)
    ids1[0, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    ids1[0, 0] = cfg.point_start_token_id
    ids = jnp.asarray(np.tile(ids1, (bs, 1)))
    mask = jnp.ones((bs, lay.prompt_len), bool)
    pc = jnp.zeros((bs, cfg.point_bert.npoints, 6), jnp.float32)
    key = jax.random.PRNGKey(0)

    trained = bool(args.ckpt) and os.path.exists(args.ckpt)
    results = {
        "size": "tiny" if args.tiny else args.size,
        "batch_size": bs,
        "new_tokens": new_tokens,
        "trained_ckpt": trained,
        "device": str(jax.devices()[0]),
    }

    def gen_fn(model):
        return jax.jit(lambda p: jnp.sum(
            generate(model, p, ids, mask, pc, key, gen)[0]
        ))

    def tok_fn(model):
        return jax.jit(lambda p: generate(
            model, p, ids, mask, pc, key, gen
        )[0])

    # ---- params
    model = TrajPointLLM(cfg, remat=False)
    qmodel = TrajPointLLM(qcfg, remat=False)
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

    use_auto = args.size == "7b" and not args.tiny
    if use_auto:
        # 12.6 GiB params: default layouts OOM on in-program transposed
        # weight copies (run_7b_chip.py) — AUTO input layouts
        from egoscaler_tpu.runtime.layouts import (
            compile_with_auto_layouts, relayout_tree,
        )

        print("compiling 7B bf16 generate (auto layouts) ...", flush=True)
        compiled, fmts = compile_with_auto_layouts(
            lambda p: jnp.sum(generate(model, p, ids, mask, pc, key, gen)[0]),
            params,
        )
        params_l = relayout_tree(params, fmts[0])
        t_bf16 = timed(f"bf16 generate bs{bs} x{new_tokens}",
                       lambda: compiled(params_l), iters=args.iters)
        del params_l
    else:
        t_bf16 = timed(f"bf16 generate bs{bs} x{new_tokens}",
                       lambda: gen_fn(model)(params), iters=args.iters)
    toks_bf16 = None
    if trained:
        toks_bf16 = np.asarray(jax.device_get(tok_fn(model)(params)))

    results["bf16"] = {
        "ms": round(t_bf16 * 1e3, 1),
        "tok_s": round(bs * new_tokens / t_bf16, 1),
        "ms_per_step": round(t_bf16 * 1e3 / new_tokens, 3),
    }

    # ---- KV8 with bf16 weights (isolates the cache-stream win;
    # needs the bf16 tree, so it runs before that tree is freed)
    if args.kv8 and not use_auto:
        kv8cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(cfg.llama, kv_quant="int8")
        )
        kv8model = TrajPointLLM(kv8cfg, remat=False)
        t_kv8 = timed(f"bf16+KV8 generate bs{bs} x{new_tokens}",
                      lambda: gen_fn(kv8model)(params), iters=args.iters)
        results["bf16_kv8"] = {
            "ms": round(t_kv8 * 1e3, 1),
            "tok_s": round(bs * new_tokens / t_kv8, 1),
            "ms_per_step": round(t_kv8 * 1e3 / new_tokens, 3),
            "speedup_vs_bf16": round(t_bf16 / t_kv8, 3),
        }
        if trained:
            toks_kv8 = np.asarray(jax.device_get(tok_fn(kv8model)(params)))
            results["bf16_kv8"]["greedy_token_agreement"] = round(
                float((toks_bf16 == toks_kv8).mean()), 4
            )

    # ---- int8
    print("quantizing / materializing int8 params ...", flush=True)
    if trained:
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
            lambda p: jnp.sum(generate(qmodel, p, ids, mask, pc, key, gen)[0]),
            qparams,
        )
        qparams = relayout_tree(qparams, fmts_q[0])
        t_int8 = timed(f"int8 generate bs{bs} x{new_tokens}",
                       lambda: compiled_q(qparams), iters=args.iters)
    else:
        t_int8 = timed(f"int8 generate bs{bs} x{new_tokens}",
                       lambda: gen_fn(qmodel)(qparams), iters=args.iters)
    results["int8"] = {
        "ms": round(t_int8 * 1e3, 1),
        "tok_s": round(bs * new_tokens / t_int8, 1),
        "ms_per_step": round(t_int8 * 1e3 / new_tokens, 3),
    }
    results["speedup"] = round(t_bf16 / t_int8, 3)

    # ---- int8 weights + int8 KV cache (the full serving composition).
    # Skipped under AUTO layouts (7B): qparams is relayouted for the
    # plain-int8 program, and KV8 is a measured regression at flagship
    # anyway (QUANT_BENCH.json) — not worth a second 6.5 GiB relayout.
    if args.kv8 and not use_auto:
        qkv8cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(
                cfg.llama, weight_quant="int8", kv_quant="int8"
            )
        )
        qkv8model = TrajPointLLM(qkv8cfg, remat=False)
        t_qkv8 = timed(f"int8+KV8 generate bs{bs} x{new_tokens}",
                       lambda: gen_fn(qkv8model)(qparams), iters=args.iters)
        results["int8_kv8"] = {
            "ms": round(t_qkv8 * 1e3, 1),
            "tok_s": round(bs * new_tokens / t_qkv8, 1),
            "ms_per_step": round(t_qkv8 * 1e3 / new_tokens, 3),
            "speedup_vs_bf16": round(t_bf16 / t_qkv8, 3),
            "speedup_vs_int8": round(t_int8 / t_qkv8, 3),
        }
        if trained:
            toks_qkv8 = np.asarray(
                jax.device_get(tok_fn(qkv8model)(qparams))
            )
            results["int8_kv8"]["greedy_token_agreement"] = round(
                float((toks_bf16 == toks_qkv8).mean()), 4
            )

    if trained:
        toks_int8 = np.asarray(jax.device_get(tok_fn(qmodel)(qparams)))
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
