"""Workspace bounds for trajectory normalization
(reference: egoscaler/configs/dataset.py:1-6)."""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class WorkspaceConfig:
    """Axis-aligned workspace box used by the `do_norm` trajectory scaler."""

    min_x: float = -2.0
    max_x: float = 2.0
    min_y: float = -2.0
    max_y: float = 2.0
    min_z: float = 0.0
    max_z: float = 2.5
