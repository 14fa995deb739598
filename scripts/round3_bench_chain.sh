#!/bin/bash
# Round-3 measurement chain (VERDICT items 1-3): runs serially on the one
# TPU after scripts/train_flagship_grounding.py has written
# GROUNDING_CKPT/best_params.npz.  Each step is independently resumable —
# re-running skips artifacts that already exist (delete a JSON to redo it).
# ONE TPU process at a time (CLAUDE.md): never run this concurrently with
# training or bench.py.
set -u
cd "$(dirname "$0")/.."
CKPT=GROUNDING_CKPT/best_params.npz

run () {  # run <artifact> <cmd...>
  local out=$1; shift
  if [ -s "$out" ]; then echo "== $out exists, skip"; return 0; fi
  local attempt rc
  for attempt in 1 2; do
    echo "== $out (attempt $attempt): $*"
    # tpu_watchdog kills a step whose CPU time freezes ~600 s — the
    # axon relay wedge (a blocked RPC that never returns) otherwise
    # burns the full timeout doing nothing.
    bash scripts/tpu_watchdog.sh 2400 "$@"
    rc=$?
    echo "== $out exit=$rc"
    [ "$rc" -eq 0 ] && break
    [ -f "$out" ] && [ ! -s "$out" ] && rm -f "$out"
    if [ "$rc" -eq 125 ] && [ "$attempt" -eq 1 ]; then
      echo "== relay wedge — waiting 60s, retrying once"
      sleep 60
      continue
    fi
    # a timeout-killed (124) or crashed TPU step may hold its axon claim
    # for a while; a quick relaunch can silently deadlock (CLAUDE.md).
    echo "== chain ABORTED at $out (rc=$rc); wait >=30s before the next TPU process"
    sleep 30
    exit "$rc"
  done
  sleep 20  # let the axon claim release before the next process
}

# ckpt-dependent steps: bench_quant_decode/bench_speculative silently
# fall back to untrained params if the ckpt is missing, and the
# resume-skip would then permanently treat those artifacts as done.
if [ ! -s "$CKPT" ]; then
  echo "missing $CKPT — run scripts/train_flagship_grounding.py --save_dir GROUNDING_CKPT first"
  exit 1
fi

run QUANT_BENCH.json \
  python scripts/bench_quant_decode.py --kv8 --ckpt "$CKPT" \
    --out QUANT_BENCH.json
run SERVING_BENCH_INT8.json \
  python scripts/bench_serving.py --quant --kv8 --out SERVING_BENCH_INT8.json
run SPECULATIVE_BENCH.json \
  python scripts/bench_speculative.py --engine --quant --target_ckpt "$CKPT" \
    --out SPECULATIVE_BENCH.json
# bs4: the 12.6 GiB bf16 7B + bs8 activations exceed 15.75 GiB HBM
# (measured 17.17 G); bs4 is the regime RUN_7B_CHIP.json validated
run QUANT_BENCH_7B.json \
  python scripts/bench_quant_decode.py --size 7b --kv8 --bs 4 \
    --out QUANT_BENCH_7B.json
run RUN_7B_TRAIN_INT8.json \
  python scripts/run_7b_chip.py --mode train --train_bs 4 --quant_trunk \
    --auto_train --out RUN_7B_TRAIN_INT8.json
echo "chain done"
