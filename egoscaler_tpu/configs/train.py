"""Training / mesh configuration.

Replaces the reference's DeepSpeed JSON + argparse flags
(models/pointllm/train.py:91-125,312-348) with a typed config.  The mesh
config describes a `jax.sharding.Mesh` with `data` and `model` axes; the
`data` axis with sharded optimizer state is the ZeRO-1 analogue
(SURVEY.md §2.4).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh: data-parallel x model(tensor)-parallel."""

    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # optimization (reference train.py:106-117,337-341)
    batch_size: int = 8
    grad_accum_steps: int = 1
    epochs: int = 10
    lr: float = 2e-5
    warmup_fraction: float = 0.2  # linear warmup over 1/5 of total steps
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    seed: int = 42

    # precision
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"

    # freezing (reference model_arch.py:33-51: point backbone + LLM layers
    # frozen, embed_tokens trainable)
    unfreeze_pc_encoder: bool = False
    unfreeze_language_model: bool = False

    # trajectory normalization (reference dataset.py:39-44)
    do_norm: bool = True
    do_standard: bool = False
    smooth_traj: bool = False

    # checkpointing
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3

    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
