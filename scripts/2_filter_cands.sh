#!/bin/bash
# Stage 2: actionability filter.  Reference used torchrun --nproc_per_node=8
# (NCCL rank sharding); here multi-host sharding comes from jax.distributed —
# run one process per host, files shard by jax.process_index automatically.
python -m egoscaler_tpu.pipelines.stages.stage2_filter \
  --data_dir "${EGOSCALER_DATA:?set EGOSCALER_DATA}" --batch_size 128
