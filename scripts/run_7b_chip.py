"""Run the FULL 7B PointLLM on the one real TPU chip: measured decode
throughput, and (frozen-backbone recipe) a measured train step.

The reference flagship is PointLLM-7B (builder.py:10
RunsenXu/PointLLM_7B_v1.2); its harness needs a multi-GPU node even for
the frozen recipe (train.py:119-125 DeepSpeed across ranks,
scripts 8xGPU).  Here the 7B trunk runs on ONE chip:

* params materialize directly in bf16 ON DEVICE, leaf by leaf inside a
  single jitted program (12.6 GiB; a host-side f32 init would need
  25 GiB and never fit);
* generate: KV-cached jitted decode (evaluate.py path) at the dataset
  layout (prompt 544, 139 new tokens);
* train: the reference freeze recipe (model_arch.py:33-51 — LLM layers
  + point backbone frozen, embeddings/projector/head trainable), so
  grads + Adam moments exist only for the small trainable subtree; bf16
  params + moments like the bf16 DeepSpeed config (train.py:91-104).

Timing is per-call host-fetched scalars (medians) — see CLAUDE.md on
relay-honest measurement.  Weights are random (zero-egress host):
throughput is shape-dependent, not weight-dependent.

Usage:  python scripts/run_7b_chip.py [--bs 4] [--mode both]
Writes: RUN_7B_CHIP.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def leafwise_bf16_params(model, example_ids, example_pc):
    from egoscaler_tpu.runtime.params import (
        leafwise_bf16_params as _leafwise,
    )

    return _leafwise(model, example_ids, example_pc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--mode", choices=["generate", "train", "both"],
                    default="both")
    ap.add_argument("--gen_tokens", type=int, default=0,
                    help="0 = the dataset answer length (139)")
    ap.add_argument("--train_bs", type=int, default=0,
                    help="0 = same as --bs")
    ap.add_argument("--out", default="RUN_7B_CHIP.json")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (smoke test of this script)")
    ap.add_argument("--quant_trunk", action="store_true",
                    help="frozen-recipe train with the frozen LLaMA "
                         "layers stored int8 (weight_quant='int8_trunk', "
                         "QLoRA-style): trunk params drop 12.6 -> ~6.5 "
                         "GiB, gradients flow through quant_matmul_diff; "
                         "lm_head/embeddings stay trainable bf16")
    ap.add_argument("--auto_train", action="store_true",
                    help="compile the train step with AUTO input layouts "
                         "(runtime/layouts.py): weights materialize in "
                         "the layouts the step prefers, killing the "
                         "~GiB-scale in-program transposed copies that "
                         "OOM bs4 with default layouts")
    args = ap.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
    from egoscaler_tpu.models.pointllm import (
        GenerateConfig,
        TrajPointLLM,
        generate,
    )
    from egoscaler_tpu.training.dataset import BatchLayout
    from egoscaler_tpu.training.trainer import (
        TrainState,
        frozen_patterns,
        make_optimizer,
        make_train_step,
        partition_params,
    )

    cfg = PointLLMConfig().tiny() if args.tiny else PointLLMConfig()
    lay = BatchLayout(cfg)
    model = TrajPointLLM(cfg, remat=not args.tiny)
    if args.quant_trunk:
        # int8 frozen trunk: a second (bf16) tree cannot coexist with
        # it on one chip, so this mode measures training only
        import dataclasses

        args.mode = "train"
        qtcfg = dataclasses.replace(
            cfg,
            llama=dataclasses.replace(cfg.llama, weight_quant="int8_trunk"),
        )
        model = TrajPointLLM(qtcfg, remat=not args.tiny)
    n_params = None

    results = {
        "model": ("PointLLM-7B (LLaMA-7B trunk + PointBERT), "
                  + ("int8 trunk (weight_quant=int8_trunk) + bf16 head"
                     if args.quant_trunk else "bf16")),
        "device": str(jax.devices()[0]),
        "prompt_len": lay.prompt_len,
        "answer_len": lay.answer_len,
    }

    ids1 = np.full((1, lay.prompt_len), 5, np.int32)
    ids1[0, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    ids1[0, 0] = cfg.point_start_token_id
    pc1 = jnp.zeros((1, cfg.point_bert.npoints, 6), jnp.float32)

    print("materializing 7B params in bf16 on device ...", flush=True)
    t0 = time.time()
    params = leafwise_bf16_params(model, jnp.asarray(ids1), pc1)
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(params)
    )
    results["n_params"] = int(n_params)
    results["params_gib"] = round(
        sum(x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(params)) / 2**30, 3
    )
    print(f"  {n_params/1e9:.2f}B params, {results['params_gib']} GiB, "
          f"{time.time()-t0:.0f}s", flush=True)

    if args.mode in ("train", "both"):
        # Single-chip 7B training is at the HBM edge (the reference needs
        # an 8-GPU node even for the frozen recipe, train.py:119-125):
        # try descending batch sizes, donating the state each time, and
        # record honestly what fits.  The grad-accum scan does NOT help
        # here — loop-invariant weight transposes get hoisted out of the
        # scan and co-reside (program 5.5 GiB vs 3.2 GiB unrolled).
        if args.train_bs:
            candidates = [args.train_bs]
        elif args.tiny:
            candidates = [args.bs]
        else:
            candidates = sorted({args.bs, 2, 1}, reverse=True)
        attempts = []
        for tb in candidates:
            tcfg = TrainConfig(batch_size=tb, lr=2e-5)
            ids = np.full((tb, lay.total_len), 5, np.int32)
            ids[:, 0] = cfg.point_start_token_id
            ids[:, 1:1 + cfg.point_bert.point_token_len] = (
                cfg.point_patch_token_id
            )
            batch = {
                "input_ids": jnp.asarray(ids),
                "attention_mask": jnp.ones((tb, lay.total_len), bool),
                "point_clouds": jnp.zeros(
                    (tb, cfg.point_bert.npoints, 6), jnp.float32
                ),
            }
            trainable, frozen = partition_params(
                params, frozen_patterns(tcfg)
            )
            tx = make_optimizer(tcfg, total_steps=100)
            state = TrainState(
                trainable, frozen, tx.init(trainable),
                jnp.asarray(0, jnp.int32),
            )
            trainable_n = sum(v.size for v in trainable.values())
            results["trainable_params"] = int(trainable_n)
            if args.auto_train:
                # AUTO input layouts: weights/state materialize in the
                # layouts the compiled step prefers — kills the
                # in-program transposed weight copies that OOM default
                # layouts at bs4 (same trick as the 7B decode path)
                import jax.tree_util as jtu
                from jax.experimental.layout import Format, Layout

                from egoscaler_tpu.runtime.layouts import relayout_tree

                raw = make_train_step(model, tx, lay.prompt_len, 1,
                                      donate=True, jit=False)
                # donated inputs need the outputs AUTO too (the aliased
                # output inherits the input's chosen layout)
                jf = jax.jit(raw, in_shardings=Format(Layout.AUTO),
                             out_shardings=Format(Layout.AUTO),
                             donate_argnums=(0,))
                abstract = jtu.tree_map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                    (state, batch),
                )
                print(f"AUTO-layout compiling train step bs {tb} ...",
                      flush=True)
                try:
                    step_fn = jf.lower(*abstract).compile()
                    fmts = step_fn.input_formats[0]
                    state = relayout_tree(state, fmts[0], delete_src=True)
                    batch = relayout_tree(batch, fmts[1])
                except Exception as e:  # noqa: BLE001
                    msg = str(e).splitlines()[0][:200]
                    attempts.append({"batch_size": tb, "fits": False,
                                     "auto_layouts": True, "error": msg})
                    print(f"  bs {tb} does not fit (AUTO): {msg}",
                          flush=True)
                    continue
            else:
                step_fn = make_train_step(model, tx, lay.prompt_len, 1,
                                          donate=True)
            state_box = [state]

            def run_step():
                new_state, m = step_fn(state_box[0], batch)
                state_box[0] = new_state
                return m["loss"]

            print(f"compiling 7B train step (frozen recipe, bs {tb}, "
                  f"seq {lay.total_len}) ...", flush=True)
            try:
                med = timed(f"7B train step bs{tb}", run_step, iters=3)
            except Exception as e:  # noqa: BLE001 — relay OOM surfaces
                msg = str(e).splitlines()[0][:200]
                attempts.append({"batch_size": tb, "fits": False,
                                 "error": msg})
                print(f"  bs {tb} does not fit: {msg}", flush=True)
                for leaf in jax.tree_util.tree_leaves(
                        state_box[0].opt_state):
                    if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                        leaf.delete()
                del state, state_box, step_fn, batch, trainable, frozen
                if any(isinstance(l, jax.Array) and l.is_deleted()
                       for l in jax.tree_util.tree_leaves(params)):
                    print("rematerializing params ...", flush=True)
                    params = leafwise_bf16_params(
                        model, jnp.asarray(ids1), pc1
                    )
                continue
            results["train"] = {
                "batch_size": tb,
                "seq_len": lay.total_len,
                "step_s": round(med, 4),
                "samples_per_sec": round(tb / med, 2),
                "recipe": "frozen LLM layers + point backbone "
                          "(model_arch.py:33-51); trainable "
                          f"{trainable_n/1e6:.0f}M params, bf16 moments, "
                          "donated state"
                          + ("; int8 frozen trunk (QLoRA-style)"
                             if args.quant_trunk else "")
                          + ("; AUTO input layouts"
                             if args.auto_train else ""),
            }
            print(json.dumps(results["train"]), flush=True)
            # the donated step consumed the original trainable leaves:
            # rebuild the full param tree from the final state and free
            # the Adam moments before generate claims the HBM
            final = state_box[0]
            params = final.full_params()
            for leaf in jax.tree_util.tree_leaves(final.opt_state):
                if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                    leaf.delete()
            del state, state_box, final, batch, trainable, frozen, step_fn
            break
        if attempts:
            results["train_attempts"] = attempts
        if "train" not in results:
            results["train"] = {
                "fits": False,
                "attempted_batch_sizes": candidates,
                "note": "single-chip 7B frozen-recipe training did not "
                        f"fit at the attempted batch sizes {candidates}; "
                        "matches the reference's multi-GPU requirement — "
                        "see FEASIBILITY_7B.json for the 8-device ZeRO-1 "
                        "mesh compile (6.6 GiB/device)",
            }

    if args.mode in ("generate", "both"):
        # Decode matvecs want every (4096, 4096) weight in the transposed
        # layout; with default argument layouts XLA inserts an in-program
        # copy of EVERY weight (~3.2 GiB of HLO temps) and the 7B program
        # exceeds HBM.  Compile with AUTO input layouts and materialize the
        # params directly in the layouts the executable wants instead.
        from egoscaler_tpu.runtime.layouts import (
            compile_with_auto_layouts,
            relayout_tree,
        )

        bs = args.bs
        new_tokens = args.gen_tokens or lay.answer_len
        gen_cfg = GenerateConfig(max_new_tokens=new_tokens, do_sample=False)
        ids = jnp.asarray(np.tile(ids1, (bs, 1)))
        mask = jnp.ones((bs, lay.prompt_len), bool)
        pc = jnp.zeros((bs, cfg.point_bert.npoints, 6), jnp.float32)
        key = jax.random.PRNGKey(0)

        print(f"compiling 7B generate (bs {bs}, {new_tokens} new tokens, "
              "auto input layouts) ...", flush=True)
        compiled, args_fmt = compile_with_auto_layouts(
            lambda p, i, m, c, k: jnp.sum(
                generate(model, p, i, m, c, k, gen_cfg)[0]
            ),
            params, ids, mask, pc, key,
        )
        print("relayouting params to the executable's layouts ...",
              flush=True)
        params = relayout_tree(params, args_fmt[0])
        ids, mask, pc, key = (
            jax.device_put(v, f)
            for v, f in zip((ids, mask, pc, key), args_fmt[1:])
        )
        med = timed(f"7B generate bs{bs} x{new_tokens}tok",
                    lambda: compiled(params, ids, mask, pc, key), iters=3)
        tok_s = bs * new_tokens / med
        results["generate"] = {
            "batch_size": bs,
            "new_tokens": new_tokens,
            "clip_s": round(med, 4),
            "tokens_per_sec": round(tok_s, 1),
            "trajectories_per_sec": round(bs / med, 3),
            "note": "AUTO input layouts (weights materialized in the "
                    "decode-preferred transposed layout; avoids ~3.2 GiB "
                    "of in-program relayout copies)",
        }
        print(json.dumps(results["generate"]), flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"ok": True, **{k: results[k] for k in
                                     ("n_params", "params_gib")}}))


if __name__ == "__main__":
    main()
