"""Tracing / profiling (SURVEY.md §5.1 — absent in the reference).

- start_trace_server: live jax.profiler endpoint (connect TensorBoard or
  xprof to the port)
- trace(): context manager writing a trace for a code region
- StepTimer: per-step wall-clock with warmup skip and percentile summary,
  synchronizing via value fetch (block_until_ready does not round-trip on the
  axon TPU tunnel)
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


def start_trace_server(port: int = 9999) -> None:
    import jax
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {"mean_s": float(a.mean()), "p50_s": float(np.percentile(a, 50)),
                "p95_s": float(np.percentile(a, 95)), "n": len(a)}
