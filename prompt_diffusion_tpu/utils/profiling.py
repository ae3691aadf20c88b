"""Tracing and per-step timing utilities.

The reference has no profiling support (SURVEY.md §5 — tqdm bars only);
the north-star metric (p50 per-step UNet+ControlNet latency) makes this a
first-class subsystem here:

  * `trace(logdir)` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable trace of everything inside.
  * `StepTimer` — records per-step wall times (blocking on results) and
    reports p50/p90/mean; used by bench.py and the trainers.
  * `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper so pipeline
    stages show up named in the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with percentile reporting.

    with timer.step():  # blocks on the result you hand to done()
        out = step_fn(...)
        timer.done(out)
    """

    def __init__(self, skip_first: int = 1):
        self.times: List[float] = []
        self.skip_first = skip_first
        self._t0: Optional[float] = None
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        holder = {}
        yield holder
        if "out" in holder:
            jax.block_until_ready(holder["out"])
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(time.perf_counter() - t0)

    def record(self, seconds: float):
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(seconds)

    def stats(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "mean_ms": float(arr.mean() * 1e3),
            "min_ms": float(arr.min() * 1e3),
        }
