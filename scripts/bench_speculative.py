"""Speculative-decoding bench: trained 1.1B target + ~25M draft on TPU.

Decode on one chip is parameter-bandwidth bound (PARITY.md: 1383 tok/s
at 1.1B bs8 vs a ~2.8 ms/step streaming roofline).  Speculative
decoding multiplies tokens-per-weight-read by the accepted-chunk
length; trajectory-token streams (<ts> b..b <tsep> ... <te>) are highly
structured, so a small draft trained on the same corpus accepts long
prefixes.

Protocol (honest per-call scalar-fetch medians, CLAUDE.md):
  1. target = flagship_tpu (1.1B) loading GROUNDING_CKPT/best_params.npz
     (written by scripts/train_flagship_grounding.py --save_dir); falls
     back to random init (acceptance then meaningless, still measures
     mechanics) — the artifact records which;
  2. draft = PointLLMConfig().draft_tpu() trained for --draft_epochs on
     the same grounded corpus (bs 8);
  3. greedy `generate` vs `speculative_generate` on a held-out batch:
     token-EXACT equality asserted, then tok/s + acceptance for each k.

Writes SPECULATIVE_BENCH.json at the repo root.
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
    ap.add_argument("--target_ckpt",
                    default=os.path.join(ROOT, "GROUNDING_CKPT",
                                         "best_params.npz"))
    ap.add_argument("--train_n", type=int, default=8192)
    ap.add_argument("--draft_epochs", type=int, default=3)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--eval_bs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--ks", type=int, nargs="+", default=[3, 4, 6])
    ap.add_argument("--engine", action="store_true",
                    help="also bench the serving ENGINE: plain continuous "
                         "batching vs speculative continuous batching "
                         "(requests = eval prompts repeated), tok/s each")
    ap.add_argument("--engine_requests", type=int, default=24)
    ap.add_argument("--engine_slots", type=int, default=8)
    ap.add_argument("--quant", action="store_true",
                    help="also measure the int8 target (weight_quant="
                         "'int8', models/quantize.py): speculative "
                         "chunking and int8 streaming compose — both "
                         "attack the same per-step weight-read bound")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "SPECULATIVE_BENCH.json"))
    args = ap.parse_args()

    import dataclasses

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import traverse_util

    from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
    from egoscaler_tpu.models.pointllm import (
        GenerateConfig, TrajPointLLM, generate,
    )
    from egoscaler_tpu.serving.speculative import speculative_generate
    from egoscaler_tpu.training.dataset import (
        BatchLayout, TrajectoryDataset, synthetic_structured_samples,
    )
    from egoscaler_tpu.training.trainer import (
        create_train_state, make_train_step,
    )

    if args.tiny:
        tcfg_model = PointLLMConfig().tiny()
        dcfg_model = tcfg_model  # same tiny arch, fresh weights
    else:
        tcfg_model = PointLLMConfig().flagship_tpu()
        dcfg_model = PointLLMConfig().draft_tpu()
    lay = BatchLayout(tcfg_model)
    target = TrajPointLLM(tcfg_model, remat=False)
    draft = TrajPointLLM(dcfg_model, remat=False)

    # ---- target params: trained checkpoint or random init
    val_s = synthetic_structured_samples(tcfg_model, args.eval_bs,
                                         seed=31_000)
    vds = TrajectoryDataset(tcfg_model, samples=val_s, seed=5)
    ex = next(vds.batches(args.eval_bs, shuffle=False))
    prompt = jnp.asarray(ex["input_ids"][:, :lay.prompt_len])
    pmask = jnp.asarray(
        ex["attention_mask"][:, :lay.prompt_len].astype(bool)
    )
    pcs = jnp.asarray(ex["point_clouds"])

    trained_target = os.path.exists(args.target_ckpt) and not args.tiny
    if trained_target:
        with np.load(args.target_ckpt) as z:
            flat = {k: jnp.asarray(z[k], jnp.bfloat16) for k in z.files}
        tparams = traverse_util.unflatten_dict(flat, sep="/")
        print(f"loaded target params from {args.target_ckpt}", flush=True)
    else:
        tparams = jax.jit(target.init)(
            jax.random.PRNGKey(0), prompt[:1], pcs[:1]
        )
        tparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, tparams
        )
        print("WARNING: no target checkpoint — random init "
              "(acceptance will be ~0 for a trained draft)", flush=True)

    # ---- train the draft on the same corpus (bf16 end-to-end)
    t0 = time.time()
    train_s = synthetic_structured_samples(dcfg_model, args.train_n, seed=0)
    tds = TrajectoryDataset(dcfg_model, samples=train_s, seed=0)
    dtrain = TrainConfig(batch_size=args.bs, lr=args.lr,
                         unfreeze_pc_encoder=True,
                         unfreeze_language_model=True)
    steps_per_epoch = len(tds) // args.bs
    sample = next(tds.batches(args.bs, shuffle=False))
    sample = {k: jnp.asarray(v) for k, v in sample.items()
              if k in ("input_ids", "attention_mask", "point_clouds")}
    state, tx = create_train_state(
        draft, dtrain, jax.random.PRNGKey(1), sample,
        steps_per_epoch * args.draft_epochs,
    )
    step_fn = make_train_step(draft, tx, lay.prompt_len, 1)
    losses = []
    for epoch in range(args.draft_epochs):
        last = None
        for i, batch in enumerate(tds.batches(args.bs, shuffle=True)):
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k in ("input_ids", "attention_mask", "point_clouds")}
            state, m = step_fn(state, batch)
            # fetch sparsely: a per-step float() costs a ~28 ms relay
            # round-trip — more than the draft step itself
            if i % 64 == 0:
                losses.append(float(m["loss"]))
            last = m
        losses.append(float(last["loss"]))
        print(f"draft epoch {epoch}: loss "
              f"{np.mean(losses[-max(steps_per_epoch // 64, 1):]):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    dparams = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, state.full_params()
    )

    # ---- measurement: greedy baseline vs speculative
    gen = GenerateConfig(max_new_tokens=lay.answer_len, do_sample=False)

    base_fn = jax.jit(lambda p, i, m, c: generate(
        target, p, i, m, c, jax.random.PRNGKey(2), gen
    ))

    def timed_tokens(fn, *a, iters=args.iters):
        """Median seconds; fn returns (tokens, lengths[, stats])."""
        outs = fn(*a)
        emitted = float(jnp.sum(jnp.minimum(
            outs[1] + 1, gen.max_new_tokens)))  # +1: the eos itself
        ts = []
        for _ in range(iters):
            s = time.perf_counter()
            o = fn(*a)
            float(jnp.asarray(jnp.sum(o[0])).ravel()[0])  # dependent fetch
            ts.append(time.perf_counter() - s)
        return float(np.median(ts)), emitted, outs

    bt, base_tokens, bouts = timed_tokens(base_fn, tparams, prompt, pmask, pcs)
    base_tps = base_tokens / bt
    print(f"baseline greedy: {bt * 1e3:.1f} ms, {base_tps:.0f} tok/s",
          flush=True)

    results = {
        "model": "tiny" if args.tiny else
                 "target flagship_tpu 1.1B + draft draft_tpu (~25M trunk)",
        "trained_target": bool(trained_target),
        "draft_epochs": args.draft_epochs,
        "draft_final_loss": round(float(np.mean(losses[-50:])), 4),
        "batch": int(prompt.shape[0]),
        "max_new_tokens": gen.max_new_tokens,
        "baseline": {"ms": round(bt * 1e3, 2),
                     "tok_s": round(base_tps, 1)},
        "speculative": [],
    }
    for k in args.ks:
        spec_fn = jax.jit(lambda p, dp, i, m, c, _k=k: speculative_generate(
            target, p, draft, dp, i, m, c, gen, k=_k
        ))
        st, spec_tokens, souts = timed_tokens(
            spec_fn, tparams, dparams, prompt, pmask, pcs
        )
        exact = bool(jnp.all(souts[0] == bouts[0]))
        stats = jax.device_get(souts[2])
        chunks = max(int(stats["chunks"]), 1)
        rec = {
            "k": k,
            "ms": round(st * 1e3, 2),
            "tok_s": round(spec_tokens / st, 1),
            "speedup": round(bt / st, 3),
            # bf16 on TPU is equivalence, not bit-identity: near-tie
            # argmax flips between the (k+1)-token verify and 1-token
            # decode tilings (0.19%/token teacher-forced, no ADE
            # impact — DIAG_DECODE.json, serving/speculative.py)
            "token_exact_vs_baseline": exact,
            "token_agreement_vs_baseline": round(float(jnp.mean(
                (souts[0] == bouts[0]).astype(jnp.float32))), 4),
            "chunks": int(stats["chunks"]),
            "mean_accepted_per_chunk": round(
                int(stats["drafts_accepted"]) / chunks, 3),
            "emitted": int(stats["tokens_emitted"]),
        }
        print(json.dumps(rec), flush=True)
        results["speculative"].append(rec)

    if args.quant:
        # int8 target: the verify chunk and the plain decode both stream
        # every weight per step, so w8a16 (ops/quant_matmul.py) halves
        # that traffic INDEPENDENTLY of speculative chunking — measure
        # the composition.  int8 rounding can flip near-argmax ties, so
        # the spec-vs-plain equality is asserted against the int8
        # target's OWN greedy stream (still token-exact by construction).
        from egoscaler_tpu.models.quantize import quantize_decode_params

        qtcfg = dataclasses.replace(
            tcfg_model,
            llama=dataclasses.replace(tcfg_model.llama, weight_quant="int8"),
        )
        qtarget = TrajPointLLM(qtcfg, remat=False)
        qtparams = jax.jit(quantize_decode_params)(tparams)
        qbase_fn = jax.jit(lambda p, i, m, c: generate(
            qtarget, p, i, m, c, jax.random.PRNGKey(2), gen
        ))
        qbt, qtok, qbouts = timed_tokens(qbase_fn, qtparams, prompt,
                                         pmask, pcs)
        results["int8_baseline"] = {
            "ms": round(qbt * 1e3, 2),
            "tok_s": round(qtok / qbt, 1),
            "speedup_vs_bf16": round(bt / qbt, 3),
            "greedy_agreement_vs_bf16": round(float(jnp.mean(
                (qbouts[0] == bouts[0]).astype(jnp.float32))), 4),
        }
        print(json.dumps(results["int8_baseline"]), flush=True)
        results["int8_speculative"] = []
        for k in args.ks:
            spec_fn = jax.jit(
                lambda p, dp, i, m, c, _k=k: speculative_generate(
                    qtarget, p, draft, dp, i, m, c, gen, k=_k
                )
            )
            st, spec_tokens, souts = timed_tokens(
                spec_fn, qtparams, dparams, prompt, pmask, pcs
            )
            stats = jax.device_get(souts[2])
            chunks = max(int(stats["chunks"]), 1)
            rec = {
                "k": k,
                "ms": round(st * 1e3, 2),
                "tok_s": round(spec_tokens / st, 1),
                "speedup_vs_bf16_plain": round(bt / st, 3),
                "speedup_vs_int8_plain": round(qbt / st, 3),
                "token_exact_vs_int8_plain": bool(
                    jnp.all(souts[0] == qbouts[0])
                ),
                "mean_accepted_per_chunk": round(
                    int(stats["drafts_accepted"]) / chunks, 3),
            }
            print(json.dumps(rec), flush=True)
            results["int8_speculative"].append(rec)

    if args.engine:
        # serving-engine regime: continuous batching, dispatch-ahead,
        # one relay fetch per chunk/round-batch.  Same trained weights.
        from egoscaler_tpu.serving import ServingEngine

        n = args.engine_requests
        ids_np = np.asarray(prompt)
        mask_np = np.asarray(pmask)
        pcs_np = np.asarray(pcs)
        reqs = [(ids_np[i % ids_np.shape[0]], mask_np[i % ids_np.shape[0]],
                 pcs_np[i % ids_np.shape[0]]) for i in range(n)]

        def run_engine(draft=None, dp=None, k=4, chunk=16):
            eng = ServingEngine(
                target, tparams, num_slots=args.engine_slots,
                prompt_len=lay.prompt_len, gen=gen, chunk=chunk,
                draft_model=draft, draft_params=dp, spec_k=k,
            )
            eng.warmup()
            te = time.perf_counter()
            rids = [eng.submit(*r) for r in reqs]
            out = eng.run()
            wall = time.perf_counter() - te
            toks = sum(len(out[r]) for r in rids)
            return wall, toks

        pw, ptok = run_engine()
        results["engine_plain"] = {
            "requests": n, "slots": args.engine_slots,
            "wall_s": round(pw, 3), "tokens": ptok,
            "tok_s": round(ptok / pw, 1),
        }
        print(json.dumps(results["engine_plain"]), flush=True)
        best_k = args.ks[0] if len(args.ks) == 1 else (
            max(results["speculative"], key=lambda r: r["tok_s"])["k"]
            if results["speculative"] else 4
        )
        sw, stok = run_engine(draft=draft, dp=dparams, k=best_k,
                              chunk=max(4, 16 // (best_k + 1)))
        results["engine_speculative"] = {
            "k": best_k, "wall_s": round(sw, 3), "tokens": stok,
            "tok_s": round(stok / sw, 1),
            "speedup_vs_plain_engine": round(pw / sw, 3),
        }
        print(json.dumps(results["engine_speculative"]), flush=True)

    results["wall_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
