"""Observability: structured JSONL metrics, step timing, profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md §5 — its only
instrumentation is a tqdm bar, muse_maskgit_pytorch.py:22,556, and host-side
loss prints, trainers.py:275-276,354). This module provides the rebuild's
observability layer:

  * `MetricsLogger` — append-only JSONL of per-step scalars + wall-clock,
    written only on the main process (role of `accelerator.print` rank
    gating, trainers.py:254);
  * `StepTimer` — rolling steps/sec and images/sec without forcing device
    syncs (values are read AFTER the async dispatch returns);
  * `profile_trace` — context manager around `jax.profiler` for on-demand
    TensorBoard traces of the jitted steps.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import deque
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, path, enabled: bool = True, flush_every: int = 1):
        self.path = Path(path)
        self.enabled = enabled
        self.flush_every = flush_every
        self._fh = None
        self._since_flush = 0
        if enabled:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "a", buffering=1)

    def log(self, step: int, **scalars):
        if not self.enabled or self._fh is None:
            return
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        self._fh.write(json.dumps(record) + "\n")
        self._since_flush += 1
        if self._since_flush >= self.flush_every:
            self._fh.flush()
            self._since_flush = 0

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class StepTimer:
    """Rolling throughput over the last `window` steps."""

    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window)

    def tick(self) -> None:
        self._times.append(time.perf_counter())

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else None


@contextlib.contextmanager
def profile_trace(log_dir, enabled: bool = True):
    """`with profile_trace('/tmp/trace'): trainer.train_step()` — writes a
    TensorBoard-viewable trace of everything dispatched inside."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
