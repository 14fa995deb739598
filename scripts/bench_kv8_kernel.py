"""KV8 decode-attention kernel micro-bench: fold vs heads vs bf16 XLA.

Isolates the attention op at the flagship decode operating point
(B=8, H=KVH=16, D=128, T=678+1 cache slots) from the full generate so
kernel changes can be judged directly.  QUANT_BENCH r5 measured the v1
per-head-loop kernel at a 0.53x whole-generate regression (~4 ms/step
of kernel overhead at 16 layers); the fold variant replaces its 16
matrix-vector dots per block with three MXU matmuls
(ops/kv8_attention._kv8_kernel_fold).

Arms (per single layer call, median of --iters dependent fetches):
  bf16_xla   — the bf16-cache decode path's attention (jnp einsum/
               softmax over a bf16 cache slice) = what KV8 must beat;
  kv8_heads  — v1 per-head-loop Pallas kernel;
  kv8_fold   — block-diagonal-folded Pallas kernel;
  kv8_xla    — dequant-through-HBM oracle (the naive no-kernel path).

Writes KV8_KERNEL_BENCH.json at the repo root.
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
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--t", type=int, default=679)
    ap.add_argument("--layers", type=int, default=16,
                    help="chain this many sequential layer calls per "
                         "timed step (decode streams every layer)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "KV8_KERNEL_BENCH.json"))
    args = ap.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from egoscaler_tpu.ops.attention import xla_attention
    from egoscaler_tpu.ops.kv8_attention import (
        decode_attention_kv8, decode_attention_kv8_xla, quantize_kv,
    )

    b, h, d, t, L = args.b, args.h, args.d, args.t, args.layers
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(L, b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, b, t, h, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(L, b, h, d)).astype(np.float32))
    mask = jnp.asarray(np.ones((b, t), bool))
    k8, ks = jax.jit(jax.vmap(quantize_kv))(k)
    v8, vs = jax.jit(jax.vmap(quantize_kv))(v)
    kb = k.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)

    def timed(label, fn, *a):
        out = np.asarray(jax.device_get(fn(*a)))  # compile + warmup
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*a)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"  {label}: {med * 1e3:.2f} ms ({L} layers)",
              file=sys.stderr, flush=True)
        return med

    def chain_layers(layer_fn):
        # L sequential attention calls with a data dependency (q of
        # layer i+1 perturbed by layer i's output mean) — models the
        # serial per-layer stream of a decode step; one scalar fetch
        def run(*arrays):
            bias = jnp.float32(0)
            outs = jnp.float32(0)
            for i in range(L):
                o = layer_fn(i, bias, *arrays)
                bias = jnp.mean(o.astype(jnp.float32)) * 1e-6
                outs = outs + jnp.sum(o.astype(jnp.float32))
            return outs
        return jax.jit(run)

    res = {"b": b, "h": h, "d": d, "t": t, "layers": L,
           "device": str(jax.devices()[0])}

    f_bf16 = chain_layers(lambda i, bias, kb, vb, qb: xla_attention(
        (qb[i] + bias.astype(jnp.bfloat16))[:, None], kb[i], vb[i],
        mask=mask[:, None, None, :])[:, 0])
    res["bf16_xla_ms"] = round(
        timed("bf16 xla cache", f_bf16, kb, vb, qb) * 1e3, 3)

    f_heads = chain_layers(
        lambda i, bias, k8, ks, v8, vs, q: decode_attention_kv8(
            q[i] + bias, k8[i], ks[i], v8[i], vs[i], mask, impl="heads"))
    res["kv8_heads_ms"] = round(
        timed("kv8 heads (v1)", f_heads, k8, ks, v8, vs, q) * 1e3, 3)

    f_fold = chain_layers(
        lambda i, bias, k8, ks, v8, vs, q: decode_attention_kv8(
            q[i] + bias, k8[i], ks[i], v8[i], vs[i], mask, impl="fold"))
    res["kv8_fold_ms"] = round(
        timed("kv8 fold (v2)", f_fold, k8, ks, v8, vs, q) * 1e3, 3)

    f_xla = chain_layers(
        lambda i, bias, k8, ks, v8, vs, q: decode_attention_kv8_xla(
            q[i] + bias, k8[i], ks[i], v8[i], vs[i], mask))
    res["kv8_xla_dequant_ms"] = round(
        timed("kv8 xla dequant", f_xla, k8, ks, v8, vs, q) * 1e3, 3)

    # numerics cross-check on chip at the real shapes
    o_f = decode_attention_kv8(q[0], k8[0], ks[0], v8[0], vs[0], mask,
                               impl="fold")
    o_h = decode_attention_kv8(q[0], k8[0], ks[0], v8[0], vs[0], mask,
                               impl="heads")
    res["fold_vs_heads_max_err"] = round(float(jnp.max(jnp.abs(
        o_f.astype(jnp.float32) - o_h.astype(jnp.float32)))), 6)
    res["fold_speedup_vs_heads"] = round(
        res["kv8_heads_ms"] / res["kv8_fold_ms"], 3)
    res["fold_vs_bf16"] = round(
        res["bf16_xla_ms"] / res["kv8_fold_ms"], 3)

    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
