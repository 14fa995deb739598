"""Metric logging: wandb-compatible, file-backed, dependency-free.

The reference logs lr/losses/ADE/FDE/GD to wandb on rank 0
(train.py:52-64,189-193,272-279).  Zero-egress TPU pods can't reach
wandb, so the default sink is a JSONL run log (one line per log call,
wandb-importable later); if wandb is importable and WANDB_MODE allows,
it mirrors there too.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class RunLogger:
    def __init__(self, run_dir: str, project: str = "egoscaler_tpu",
                 name: Optional[str] = None, config: Optional[dict] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if os.environ.get("WANDB_MODE", "disabled") != "disabled":
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=name, config=config or {}
                )
            except Exception:
                self._wandb = None
        if config:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, float], step: Optional[int] = None):
        rec = {"ts": time.time(), **metrics}
        if step is not None:
            rec["step"] = step
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
