"""Tracing / profiling: first-class stage counters + jax.profiler hooks.

The reference has only ad-hoc wall-clock prints and RSS logs
(SURVEY.md §5.1); here every pipeline stage gets a named throughput
counter (clips/sec, samples/sec) and XLA-level traces come from
jax.profiler on demand (JAX_TRACE_DIR env or explicit calls).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulating per-stage wall time + item counts."""

    def __init__(self):
        self.total_s: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def track(self, stage: str, items: int = 1) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total_s[stage] += time.perf_counter() - t0
            self.count[stage] += items

    def throughput(self, stage: str) -> float:
        t = self.total_s.get(stage, 0.0)
        return self.count.get(stage, 0) / t if t > 0 else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.total_s[k], 3),
                "count": self.count[k],
                "per_sec": round(self.throughput(k), 3),
            }
            for k in self.total_s
        }

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace scope; no-op when no directory is configured."""
    log_dir = log_dir or os.environ.get("JAX_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_mb() -> float:
    """Process RSS in MB (psutil-free; reference 7_get:29-32)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0
