#!/bin/bash
# Stage 3: manipulated-object + rigidity annotation (+ infos.json aggregation)
python -m egoscaler_tpu.pipelines.stages.stage3_object \
  --data_dir "${EGOSCALER_DATA:?set EGOSCALER_DATA}" --batch_size 256
python -m egoscaler_tpu.pipelines.stages.stage3_object \
  --data_dir "${EGOSCALER_DATA}" --format_all
