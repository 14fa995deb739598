#!/bin/bash
# Model fine-tuning (reference scripts + train.py defaults: bs 8, 10 epochs)
python -m egoscaler_tpu.training.cli \
  --root_dir "${EGOSCALER_DATA:?set EGOSCALER_DATA}" \
  --run_dir "${RUN_DIR:-runs/desc2traj}" --do_norm "$@"
