#!/bin/bash
# Stages 5-7: temporal localization, boxes, 6DoF trajectory extraction,
# then COCO split assembly.
set -e
D="${EGOSCALER_DATA:?set EGOSCALER_DATA}"
python -m egoscaler_tpu.pipelines.stages.stage5_timestamps --data_dir "$D"
python -m egoscaler_tpu.pipelines.stages.stage6_boxes --data_dir "$D"
python -m egoscaler_tpu.pipelines.stages.stage_hod --data_dir "$D" \
  ${HOD_KIND:+--hod "$HOD_KIND"}
python -m egoscaler_tpu.pipelines.stages.stage7_trajectory --data_dir "$D" \
  ${DEPTH_CKPT:+--depth_checkpoint "$DEPTH_CKPT"}
python -m egoscaler_tpu.training.build_dataset --data_dir "$D"
