#!/bin/bash
# Stage 1: candidate extraction (reference scripts/1_get_cands.sh equivalent)
python -m egoscaler_tpu.pipelines.stages.stage1_candidates \
  --root_dir "${EGOEXO4D_ROOT:?set EGOEXO4D_ROOT}" \
  --save_dir "${EGOSCALER_DATA:?set EGOSCALER_DATA}" \
  --dataset_name egoexo4d
