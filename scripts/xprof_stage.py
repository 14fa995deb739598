"""Device-timeline profiling of one bench stage through the axon relay.

`jax.profiler.start_trace` works through the relay (ROUND3.md): it
captures per-fusion device durations.  This script runs ONE stage
program from bench.py under the tracer and prints the top ops by total
device time, aggregated two ways:

  * by exact op name (spot the single worst fusion);
  * by op family (fusion / sort / custom-call / dynamic-update-slice ...)
    to see structural overheads like lax.map stitching.

Usage: python scripts/xprof_stage.py {reg|depth|gdino|sam|tracker} [top_n]
"""
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np


def run_stage(which: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    rng = np.random.default_rng(0)
    builders = {
        "reg": bench.bench_registration,
        "depth": bench.bench_depth,
        "gdino": bench.bench_detector,
        "sam": bench.bench_sam,
        "tracker": bench.bench_learned_tracker,
    }
    label, fn = builders[which](rng)
    print(f"stage: {label}", file=sys.stderr)
    return fn


def family(name: str) -> str:
    """Collapse op names into XLA op families for structural totals."""
    base = name.split(".")[0]
    for fam in (
        "fusion", "dynamic-update-slice", "dynamic-slice", "copy",
        "convert", "custom-call", "sort", "scatter", "gather", "reduce",
        "transpose", "concatenate", "broadcast", "iota", "select",
        "bitcast", "all-reduce", "while", "convolution", "dot",
        "slice", "pad", "reshape", "compare", "add", "multiply",
    ):
        if base.startswith(fam):
            return fam
    return base.rstrip("0123456789_")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "reg"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    iters = int(os.environ.get("XPROF_ITERS", "3"))

    import jax

    fn = run_stage(which)
    # warm up (compile) OUTSIDE the trace
    float(np.asarray(fn()).ravel()[0])

    tdir = f"/tmp/xprof_{which}"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for _ in range(iters):
        float(np.asarray(fn()).ravel()[0])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace written under {tdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # map pid -> process name; keep only the TPU device timeline
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "/device:TPU:0" in pname:
                device_pids.add(e["pid"])
    by_name = collections.Counter()
    by_fam = collections.Counter()
    by_cat = collections.Counter()
    cat_flops = collections.Counter()
    cat_bytes = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3 / iters  # us -> ms, per iteration
        name = e.get("name", "?")
        args = e.get("args", {})
        by_name[name] += dur
        by_fam[family(name)] += dur
        calls[name] += 1
        total += dur
        cat = args.get("hlo_category")
        if cat is not None:  # leaf op with stats (parent spans carry none)
            by_cat[cat] += dur
            cat_flops[cat] += int(args.get("model_flops", 0) or 0) / iters
            cat_bytes[cat] += int(args.get("bytes_accessed", 0) or 0) / iters

    print(f"\ndevice total: {total:.1f} ms/iter over {iters} iters")
    print(f"\n== top {top_n} ops by total device time ==")
    for name, ms in by_name.most_common(top_n):
        print(f"  {ms:8.2f} ms  x{calls[name] // iters:<5d} {name[:90]}")
    print("\n== by hlo category (leaf ops; achieved GF/s + GB/s) ==")
    for cat, ms in by_cat.most_common(20):
        gfs = cat_flops[cat] / 1e9 / (ms / 1e3) if ms else 0.0
        gbs = cat_bytes[cat] / 1e9 / (ms / 1e3) if ms else 0.0
        print(f"  {ms:8.2f} ms  {cat:<28s} {gfs:8.0f} GF/s {gbs:7.1f} GB/s")
    print("\n== by op family ==")
    for fam, ms in by_fam.most_common(20):
        print(f"  {ms:8.2f} ms  {fam}")


if __name__ == "__main__":
    main()
