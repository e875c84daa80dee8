"""Metrics logging and profiling hooks.

The reference's observability is stdout prints plus a gnuplot curve
(``objective.lua:207-214``, ``main.lua:59-78``) and a per-step
``torch.Timer`` whose value is never printed (``main.lua:132,137``). Here:

* :class:`MetricsLogger` — JSONL stream of per-step scalars (the four loss
  series, counts, wall-time) for tooling; the stdout print and the PNG plot
  live in main.py / utils/plotting.py;
* :class:`StepTimer` — wall-clock with exponential moving average;
* :func:`profiler_trace` — context manager around ``jax.profiler`` for
  device traces (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str]):
        self._f = open(path, "a") if path else None

    def log(self, step: int, metrics: Dict[str, float], **extra):
        if self._f is None:
            return
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}, **extra}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


class StepTimer:
    """Wall-clock per-step timer with EMA (the torch.Timer the reference
    allocates but never reports)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            (1 - self.alpha) * self.ema + self.alpha * dt
        )
        return dt


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Device trace around a block; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
