"""Multi-host initialization + cross-host data utilities.

Replaces torchrun/NCCL process management (SURVEY.md §2.4/§5.8):
`initialize()` wires jax.distributed from standard TPU pod env vars (or
explicit args); `global_batch()` builds a globally-sharded array from
per-host data via jax.make_array_from_process_local_data — the
equivalent of the reference's `files[rank::world_size]` sharding plus
DeepSpeed's allreduce plumbing, compiled by XLA over ICI/DCN.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Dict[str, int]:
    """jax.distributed.initialize (idempotent); returns topology info."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            pass  # single-process
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def global_batch(mesh, local_batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Per-host arrays -> globally sharded jax.Arrays over the mesh's
    `data` axis (multi-host input pipeline)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in local_batch.items():
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
