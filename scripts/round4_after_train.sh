#!/bin/bash
# Round-4 post-training TPU sequence (serialized, one process at a time).
# Run ONLY after train_flagship_grounding.py has exited and released the
# axon claim.  Each step resumable; artifacts are skipped when present.
set -u
cd "$(dirname "$0")/.."

echo "== [1/3] measurement chain (QUANT/SERVING_INT8/SPECULATIVE/7B)"
bash scripts/round3_bench_chain.sh || echo "chain aborted (see above)"
sleep 10

echo "== [2/3] scaled tracker training + 80f/800q gate"
if [ ! -s egoscaler_tpu/assets/tracker_occlusion.config.json ]; then
  timeout 3000 python scripts/train_tracker.py --scale --gate_full \
    --t 12 --hw 96 --q 16 --steps 2400 \
    || echo "tracker training failed (tiny asset remains valid)"
else
  echo "scaled tracker sidecar exists, skip"
fi
sleep 10

echo "== [3/3] dual-regime bench"
timeout 3000 python bench.py | tail -1 | tee BENCH_LOCAL_r04.json
echo "round-4 TPU sequence done"
