"""Profiling hooks — the tracing subsystem the reference lacks (SURVEY.md §5:
its only instrumentation is wall-clock prints and a TRT layer profiler in the
deprecated image path).

* `trace(dir)` — context manager around jax.profiler for a perfetto/xprof
  trace of a few steps (view in xprof/tensorboard).
* `StepTimer` — host-side per-step wall clock with warmup skip and
  percentile summary; used by `--profile_steps`.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # backend may not support tracing (axon relay)
        print(f"jax.profiler unavailable ({e}); falling back to StepTimer")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            return
        self._count += 1
        if self._count > self.warmup:
            self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {"steps": len(t), "mean_ms": float(t.mean() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p95_ms": float(np.percentile(t, 95) * 1e3)}
