#!/bin/bash
# Stage 4: clip frame extraction (VRS needs projectaria on this host)
python -m egoscaler_tpu.pipelines.stages.stage4_frames \
  --root_dir "${EGOEXO4D_ROOT:?set EGOEXO4D_ROOT}" \
  --save_dir "${EGOSCALER_DATA:?set EGOSCALER_DATA}" --source vrs --workers 8
