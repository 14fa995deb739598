"""Serving throughput: continuous batching vs static offline batching.

The reference has no concurrent serving path (chat_gradio.py handles
one request; evaluate.py:97-170 statically batches a fixed file) — this
measures the beyond-parity ServingEngine on the real chip at the
flagship (1.1B) scale and the dataset operating point (prompt 544,
answers up to 139 tokens).

Two workloads, N requests into S slots:

* uniform — every request wants the full answer budget.  Static
  batching is optimal here; the engine pays its per-admission B=1
  prefills and per-chunk host syncs, so this bounds the engine's
  overhead.
* mixed — request budgets vary 16..139 in arrival order (a realistic
  queue).  A static batch holds every lane until its longest member
  finishes; the engine frees lanes early and admits queued requests,
  which is the point of continuous batching.

Timing is wall-clock over the whole workload INCLUDING host syncs (the
honest serving cost through the relay; compiles are warmed up first).
Weights are random (zero-egress): cost is shape-dependent.

Usage:  python scripts/bench_serving.py [--tiny] [--requests 32]
Writes: SERVING_BENCH.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_prompts(cfg, lay, n, seed=0):
    rng = np.random.RandomState(seed)
    P = lay.prompt_len
    ids = np.full((n, P), 5, np.int32)
    ids[:, 0] = cfg.point_start_token_id
    ids[:, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    t0 = 1 + cfg.point_bert.point_token_len
    ids[:, t0:] = rng.randint(5, 1000, size=(n, P - t0))
    mask = np.ones((n, P), bool)
    pcs = rng.randn(n, cfg.point_bert.npoints, 6).astype(np.float32)
    return ids, mask, pcs


def run_engine(model, params, cfg, lay, gen, ids, mask, pcs, budgets,
               slots, chunk, auto=False, engine_box=None):
    """One serving run; returns (wall_s, tokens_emitted, latencies)."""
    from egoscaler_tpu.serving import ServingEngine

    if engine_box and engine_box[0] is not None:
        eng = engine_box[0]  # reuse (7B: params were relayouted/donated)
    else:
        eng = ServingEngine(
            model, params, num_slots=slots, prompt_len=lay.prompt_len,
            gen=gen, chunk=chunk, auto_param_layouts=auto,
            donate_params=auto,  # 7B: a second param copy cannot coexist
        )
        eng.warmup()  # compile the prefill + decode ladders
        if engine_box is not None:
            engine_box[0] = eng

    t0 = time.perf_counter()
    rids = [
        eng.submit(ids[i], mask[i], pcs[i], max_new_tokens=budgets[i])
        for i in range(len(ids))
    ]
    done_at = {}
    results = {}
    while eng.pending:
        eng.step()
        now = time.perf_counter() - t0
        for rid, toks in eng.take_results().items():
            done_at[rid] = now
            results[rid] = toks
    wall = time.perf_counter() - t0
    results.update(eng.take_results())
    n_tok = sum(len(results[r]) for r in rids)
    lat = np.array([done_at[r] for r in rids])
    return wall, n_tok, lat


def run_static(model, params, cfg, lay, gen_template, ids, mask, pcs,
               budgets, slots):
    """Static batching baseline: waves of `slots` requests in arrival
    order; every wave decodes its LONGEST member's budget (the lane
    cannot be reused mid-wave — evaluate.py:97-170 semantics)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.models.pointllm import generate

    n = len(ids)
    waves = [list(range(i, min(i + slots, n))) for i in range(0, n, slots)]
    # one compiled program per distinct wave-max budget
    progs = {}
    for w in waves:
        wmax = max(budgets[i] for i in w)
        if wmax not in progs:
            g = dataclasses.replace(gen_template, max_new_tokens=wmax)

            def fn(p, i, m, c, k, _g=g):
                return generate(model, p, i, m, c, k, _g)

            progs[wmax] = jax.jit(fn)
            # warmup compile
            np.asarray(progs[wmax](
                params, jnp.asarray(ids[w]), jnp.asarray(mask[w]),
                jnp.asarray(pcs[w]), jax.random.PRNGKey(0),
            )[0])

    t0 = time.perf_counter()
    n_tok = 0
    for w in waves:
        wmax = max(budgets[i] for i in w)
        toks, lens = progs[wmax](
            params, jnp.asarray(ids[w]), jnp.asarray(mask[w]),
            jnp.asarray(pcs[w]), jax.random.PRNGKey(0),
        )
        toks = np.asarray(toks)  # host fetch = the serving boundary
        lens = np.asarray(lens)
        for j, i in enumerate(w):
            n_tok += int(min(lens[j] + 1, budgets[i]))
    wall = time.perf_counter() - t0
    return wall, n_tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config, CPU (same as --model tiny)")
    ap.add_argument("--model", choices=["tiny", "flagship", "7b"],
                    default="flagship")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--quant", action="store_true",
                    help="serve int8 weights through the Pallas w8a16 "
                         "kernel (models/quantize.py); at 7B this also "
                         "sidesteps the AUTO-layout requirement — int8 "
                         "weights feed pallas_call directly, no "
                         "transposed in-program copies")
    ap.add_argument("--kv8", action="store_true",
                    help="serve with the int8 KV cache (Pallas flash-"
                         "decode, ops/kv8_attention.py) — composes with "
                         "--quant for the full int8-weights + int8-cache "
                         "serving stack")
    ap.add_argument("--out", default="SERVING_BENCH.json")
    args = ap.parse_args()
    if args.tiny:
        args.model = "tiny"

    import jax
    if args.model == "tiny":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.pointllm import GenerateConfig, TrajPointLLM
    from egoscaler_tpu.runtime.params import leafwise_bf16_params
    from egoscaler_tpu.training.dataset import BatchLayout

    cfg = {
        "tiny": lambda: PointLLMConfig().tiny(),
        "flagship": lambda: PointLLMConfig().flagship_tpu(),
        # full 7B: fits one chip ONLY with AUTO param layouts (see
        # serving/engine.py auto_param_layouts + scripts/run_7b_chip.py)
        "7b": lambda: PointLLMConfig(),
    }[args.model]()
    args.tiny = args.model == "tiny"
    is_7b = args.model == "7b"
    if args.quant or args.kv8:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llama=dataclasses.replace(
                cfg.llama,
                weight_quant="int8" if args.quant else cfg.llama.weight_quant,
                kv_quant="int8" if args.kv8 else cfg.llama.kv_quant,
            )
        )
    if args.quant:
        is_7b = False  # int8 params need no AUTO layouts (pallas operands)
    lay = BatchLayout(cfg)
    model = TrajPointLLM(cfg, remat=False)
    max_tok = 16 if args.tiny else lay.answer_len
    gen = GenerateConfig(max_new_tokens=max_tok, do_sample=False)

    n = args.requests
    ids, mask, pcs = make_prompts(cfg, lay, n, seed=0)
    print(f"materializing params in bf16 on device ...", flush=True)
    params = leafwise_bf16_params(
        model, jnp.asarray(ids[:1]), jnp.asarray(pcs[:1])
    )

    rng = np.random.RandomState(42)
    lo = max(2, max_tok // 8)
    mixed = rng.randint(lo, max_tok + 1, size=n).tolist()
    workloads = {
        "uniform": [max_tok] * n,
        "mixed": mixed,
    }

    if (args.quant or args.kv8) and args.out == "SERVING_BENCH.json":
        args.out = "SERVING_BENCH_INT8.json"
    results = {
        "model": {"tiny": "tiny", "flagship": "flagship_tpu (1.1B), bf16",
                  "7b": "PointLLM-7B, bf16, AUTO param layouts"}[args.model]
        + (" + int8 weights (w8a16 Pallas)" if args.quant else "")
        + (" + int8 KV cache (KV8 Pallas flash-decode)" if args.kv8
           else ""),
        "device": str(jax.devices()[0]),
        "prompt_len": lay.prompt_len,
        "max_new_tokens": max_tok,
        "requests": n,
        "slots": args.slots,
        "chunk": args.chunk,
    }
    engine_box = [None]
    for name, budgets in workloads.items():
        print(f"== workload {name} (sum budgets "
              f"{sum(budgets)}) ==", flush=True)
        e_wall, e_tok, lat = run_engine(
            model, params, cfg, lay, gen, ids, mask, pcs, budgets,
            args.slots, args.chunk, auto=is_7b, engine_box=engine_box,
        )
        rec = {
            "budgets_sum": int(sum(budgets)),
            "engine": {
                "wall_s": round(e_wall, 3),
                "tokens": int(e_tok),
                "tok_per_s": round(e_tok / e_wall, 1),
                "req_per_s": round(n / e_wall, 2),
                "latency_mean_s": round(float(lat.mean()), 3),
                "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
            },
        }
        if is_7b:
            # a second 12.6 GiB param layout for generate() cannot
            # coexist on the chip: the static reference is the AOT
            # offline-generate number measured by scripts/run_7b_chip.py
            ref = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "RUN_7B_CHIP.json",
            )
            if os.path.exists(ref):
                with open(ref) as f:
                    g = json.load(f).get("generate", {})
                rec["offline_generate_reference"] = g
                if g.get("tokens_per_sec"):
                    rec["engine_speedup_vs_offline"] = round(
                        (e_tok / e_wall) / g["tokens_per_sec"], 2
                    )
        else:
            s_wall, s_tok = run_static(
                model, params, cfg, lay, gen, ids, mask, pcs, budgets,
                args.slots,
            )
            rec["static_batching"] = {
                "wall_s": round(s_wall, 3),
                "tokens": int(s_tok),
                "tok_per_s": round(s_tok / s_wall, 1),
                "req_per_s": round(n / s_wall, 2),
            }
            rec["engine_speedup"] = round(s_wall / e_wall, 2)
        results[name] = rec
        print(json.dumps(rec), flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"ok": True}))


if __name__ == "__main__":
    main()
