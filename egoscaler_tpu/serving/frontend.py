"""Thread-safe frontend for the ServingEngine.

Bridges blocking callers (HTTP handler threads — vis/chat_web.py) to
the single-threaded engine loop: callers ``submit_and_wait`` from any
thread; ONE worker thread owns every JAX call (one TPU program at a
time — CLAUDE.md) and drives ``engine.step()`` while work is pending.
Concurrent callers share decode ticks instead of queueing on a lock,
which is the whole point of continuous batching (reference
chat_gradio.py holds a global model lock instead).
"""
from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np

from egoscaler_tpu.serving.engine import ServingEngine


class EngineWorker:
    """Owns a ServingEngine on a dedicated thread.

    submit_and_wait() may be called from any number of threads; each
    blocks until its request's tokens are ready.  stop() drains nothing
    — pending callers get a RuntimeError.
    """

    def __init__(self, engine: ServingEngine):
        self._eng = engine
        self._cv = threading.Condition()
        self._results: Dict[int, np.ndarray] = {}
        self._stopped = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit_and_wait(
        self, input_ids, prompt_mask, point_cloud,
        max_new_tokens: Optional[int] = None,
        timeout: Optional[float] = None,
    ) -> np.ndarray:
        with self._cv:
            if self._stopped:
                raise RuntimeError("EngineWorker is stopped")
            rid = self._eng.submit(
                input_ids, prompt_mask, point_cloud,
                max_new_tokens=max_new_tokens,
            )
            self._cv.notify_all()  # wake the worker
            ok = self._cv.wait_for(
                lambda: rid in self._results or self._stopped, timeout
            )
            if rid in self._results:
                return self._results.pop(rid)
            if self._stopped:
                raise RuntimeError("EngineWorker stopped while waiting")
            if not ok:
                raise TimeoutError(f"request {rid} timed out")
            raise AssertionError("unreachable")

    def _loop(self):
        while True:
            with self._cv:
                self._cv.wait_for(
                    lambda: self._stopped or self._eng.pending
                )
                if self._stopped:
                    self._cv.notify_all()
                    return
            # step OUTSIDE the lock: submits stay responsive while the
            # chip decodes.  engine.submit only appends to a deque (GIL-
            # atomic); engine.step is called from this thread only.
            self._eng.step()
            done = self._eng.take_results()
            if done:
                with self._cv:
                    self._results.update(done)
                    self._cv.notify_all()

    def stop(self):
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        self._thread.join(timeout=10)
