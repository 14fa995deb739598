"""Device mesh construction.

Replaces the reference's NCCL/torchrun/DeepSpeed process topology
(SURVEY.md §2.4) with a single `jax.sharding.Mesh` carrying `data` and
`model` axes.  `data` is the DDP/ZeRO axis (optimizer state sharded over
it = ZeRO-1 analogue); `model` is Megatron-style tensor parallelism for
the LLaMA trunk.  XLA compiles all collectives over ICI/DCN.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egoscaler_tpu.configs import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.  With cfg=None, all devices go to the
    data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(data=n, model=1)
    assert cfg.num_devices == n, (
        f"mesh {cfg.data}x{cfg.model} != {n} devices"
    )
    arr = np.asarray(devices).reshape(cfg.data, cfg.model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
