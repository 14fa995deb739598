"""Device-timeline profile of the flagship decode step.

QUANT_BENCH r5: decode-only 3.65 ms/tok at 1.1B bs8 vs a ~2.8 ms
streaming roofline (1.8 GiB bf16 params @ ~650 GB/s).  This script
traces a short generate (prefill + N scan steps) and aggregates device
time by op/category to name where the 0.85 ms/step gap lives (weight
streams below peak BW?  attention?  sampling/top-k?  cache scatter?).

Usage: python scripts/profile_decode.py [steps] [top_n]
Writes nothing; prints the breakdown (normalized per decode step).
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.pointllm import (
        GenerateConfig, TrajPointLLM, generate,
    )
    from egoscaler_tpu.runtime.params import leafwise_bf16_params
    from egoscaler_tpu.training.dataset import BatchLayout

    cfg = PointLLMConfig().flagship_tpu()
    lay = BatchLayout(cfg)
    bs = 8
    model = TrajPointLLM(cfg, remat=False)
    gen = GenerateConfig(max_new_tokens=steps, do_sample=False)

    ids1 = np.full((1, lay.prompt_len), 5, np.int32)
    ids1[0, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    ids1[0, 0] = cfg.point_start_token_id
    ids = jnp.asarray(np.tile(ids1, (bs, 1)))
    mask = jnp.ones((bs, lay.prompt_len), bool)
    pc = jnp.zeros((bs, cfg.point_bert.npoints, 6), jnp.float32)
    key = jax.random.PRNGKey(0)

    print("materializing params ...", file=sys.stderr, flush=True)
    params = leafwise_bf16_params(model, ids[:1], pc[:1])
    fn = jax.jit(lambda p: jnp.sum(
        generate(model, p, ids, mask, pc, key, gen)[0]))
    print("compiling ...", file=sys.stderr, flush=True)
    float(np.asarray(fn(params)).ravel()[0])  # compile outside trace

    tdir = "/tmp/xprof_decode"
    os.system(f"rm -rf {tdir}")
    iters = 2
    jax.profiler.start_trace(tdir)
    for _ in range(iters):
        float(np.asarray(fn(params)).ravel()[0])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {tdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "/device:TPU:0" in e.get("args", {}).get("name", ""):
                device_pids.add(e["pid"])

    by_name = collections.Counter()
    by_cat = collections.Counter()
    cat_flops = collections.Counter()
    cat_bytes = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3 / iters  # ms per whole-generate
        name = e.get("name", "?")
        args = e.get("args", {})
        by_name[name] += dur
        calls[name] += 1
        total += dur
        cat = args.get("hlo_category")
        if cat is not None:
            by_cat[cat] += dur
            cat_flops[cat] += int(args.get("model_flops", 0) or 0) / iters
            cat_bytes[cat] += int(args.get("bytes_accessed", 0) or 0) / iters

    print(f"\ndevice total {total:.1f} ms/generate "
          f"({total / steps:.3f} ms amortized over {steps} new tokens; "
          f"prefill included)")
    print(f"\n== top {top_n} ops by total device time (per generate) ==")
    for name, ms in by_name.most_common(top_n):
        print(f"  {ms:8.2f} ms  x{calls[name] // iters:<6d} {name[:84]}")
    print("\n== by hlo category (achieved GF/s, GB/s) ==")
    for cat, ms in by_cat.most_common(20):
        gfs = cat_flops[cat] / 1e9 / (ms / 1e3) if ms else 0.0
        gbs = cat_bytes[cat] / 1e9 / (ms / 1e3) if ms else 0.0
        print(f"  {ms:8.2f} ms  {cat:<30s} {gfs:8.0f} GF/s {gbs:7.1f} GB/s")


if __name__ == "__main__":
    main()
