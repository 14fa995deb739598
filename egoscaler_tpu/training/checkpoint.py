"""Orbax checkpointing: latest + best-ADE, with full resume.

Rebuild of the reference torch.save checkpointing
(models/pointllm/train.py:127-150,287-308): `latest_model` every epoch,
`best_model_ade` on ADE improvement, each carrying model + optimizer +
step for exact resume.  Orbax gives async, atomic, sharding-aware saves
(SURVEY.md §5.4).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from egoscaler_tpu.training.trainer import TrainState


class CheckpointManager:
    """latest/best pair, mirroring train.py's two checkpoint files."""

    def __init__(self, directory: str, keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.dir = directory
        self._mngr = ocp.CheckpointManager(
            os.path.join(directory, "latest"),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )
        self._best = ocp.CheckpointManager(
            os.path.join(directory, "best_ade"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        # Persisted so a resumed run cannot clobber the best checkpoint
        # with a worse ADE (train.py:287-308 keeps the best metric live
        # across --resume because it reloads the checkpoint's epoch state).
        self._best_metric_path = os.path.join(directory, "best_ade.json")
        self.best_ade = float("inf")
        if os.path.exists(self._best_metric_path):
            with open(self._best_metric_path) as f:
                self.best_ade = float(json.load(f)["best_ade"])

    def save_latest(self, step: int, state: TrainState, extra: Optional[dict] = None):
        # Metadata lives in a sidecar json, not the orbax payload: orbax
        # StandardRestore requires an exact template match, and extras
        # vary per save.
        self._mngr.save(step, args=ocp.args.StandardSave({"state": state}))
        if extra:
            self._write_json(
                os.path.join(self.dir, "latest_extra.json"),
                {"step": int(step), **extra},
            )

    def save_best(self, step: int, state: TrainState, ade: float):
        if ade < self.best_ade:
            self.best_ade = ade
            self._best.save(
                step,
                args=ocp.args.StandardSave({"state": state}),
                force=True,
            )
            self._write_json(
                self._best_metric_path, {"best_ade": float(ade), "step": int(step)}
            )
            return True
        return False

    @staticmethod
    def _write_json(path: str, payload: dict):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    def restore_latest(self, template: TrainState) -> Tuple[Optional[TrainState], int]:
        step = self._mngr.latest_step()
        if step is None:
            return None, 0
        payload = self._mngr.restore(
            step, args=ocp.args.StandardRestore({"state": template})
        )
        return payload["state"], step

    def restore_best(self, template: TrainState) -> Optional[TrainState]:
        step = self._best.latest_step()
        if step is None:
            return None
        payload = self._best.restore(
            step, args=ocp.args.StandardRestore({"state": template})
        )
        return payload["state"]

    def wait(self):
        self._mngr.wait_until_finished()
        self._best.wait_until_finished()
