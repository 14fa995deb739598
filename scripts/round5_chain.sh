#!/bin/bash
# Round-5 TPU chain (VERDICT r4 items 1-8): serial, one TPU process at a
# time (CLAUDE.md), every step under tpu_watchdog with wedge retry.
#
# Unlike round 3's chain this one is MARKER-gated (docs/r5/<step>.done),
# not artifact-gated: several artifacts from round 4 exist but carry
# invalid numbers and must be REPLACED (QUANT_BENCH.json measured
# compile time; QUANT_BENCH_7B predates the AUTO-layout int8 fix).
# Training steps resume from snapshots on retry, so a relay wedge costs
# the step, not the schedule.
set -u
cd "$(dirname "$0")/.."
CKPT=GROUNDING_CKPT/best_params.npz
mkdir -p docs/r5

run () {  # run <marker-name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  local marker=docs/r5/$name.done
  if [ -f "$marker" ]; then echo "== $name done, skip"; return 0; fi
  local attempt rc
  for attempt in 1 2 3; do
    echo "== $name (attempt $attempt) $(date +%H:%M:%S): $*"
    bash scripts/tpu_watchdog.sh "$tmo" "$@" 2>&1 | tee -a "docs/r5/$name.log"
    rc=${PIPESTATUS[0]}
    echo "== $name exit=$rc"
    if [ "$rc" -eq 0 ]; then touch "$marker"; sleep 20; return 0; fi
    # wedge (125) or crash: wait for the axon claim to release, retry
    sleep 60
  done
  echo "== $name FAILED after 3 attempts — continuing chain"
  return 1
}

if [ ! -s "$CKPT" ]; then
  echo "missing $CKPT"; exit 1
fi

# 1. decode-numerics diagnostics (VERDICT items 4+5)
run diag 4000 \
  python scripts/diag_decode_numerics.py --kv8 --int8 --out DIAG_DECODE.json

# 2. QUANT_BENCH re-measure with the fixed harness (VERDICT item 1)
run quant 4000 \
  python scripts/bench_quant_decode.py --size flagship --kv8 \
    --ckpt "$CKPT" --out QUANT_BENCH.json

# 3. tracker at scale (VERDICT item 3 — carried twice, must land)
run tracker 10000 \
  python scripts/train_tracker.py --scale --gate_full --t 12 --hw 96 \
    --q 16 --steps 2400 --snapshot docs/r5/tracker_snap.npz

# 4. transfer reproduction: ONE continuous run, snapshot-resumed on
#    wedge so the optimizer schedule is never restarted (VERDICT item 6)
run transfer 12000 \
  python scripts/train_flagship_grounding.py --unfreeze_lm \
    --align_epochs 4 --align_n 8192 --epochs 8 --train_n 1024 --bs 8 \
    --eval_every 2 --save_dir GROUNDING_CKPT_R5 \
    --snapshot_dir docs/r5/ground_snap --resume \
    --out GROUNDING_ALIGN3.json

# 5. 7B quantization re-run under AUTO layouts (VERDICT item 7a)
run quant7b 4500 \
  python scripts/bench_quant_decode.py --size 7b --bs 4 \
    --out QUANT_BENCH_7B.json

# 6. 7B int8-trunk TRAIN without --train_bs: candidates 4,2,1 so the
#    bs2 attempt RUN_7B_CHIP says fits gets recorded (VERDICT item 7b)
run train7b 4500 \
  python scripts/run_7b_chip.py --mode train --quant_trunk --auto_train \
    --out RUN_7B_TRAIN_INT8.json

# 7. golden demo with the learned tracker seeding stage 7 (item 8)
run golden 2400 \
  python examples/demo_stage7_golden.py --platform tpu --tracker

# 8. full dual-regime bench (fills .jax_cache for the driver's run)
run bench 3000 python bench.py

echo "round-5 chain done $(date +%H:%M:%S)"
