"""Timing + XLA profiler helpers (the reference's only profiling is BVH
build timing, BVH.hpp:61-64; the solver itself has zero timers)."""

from __future__ import annotations

import contextlib
import time

import numpy as np


class Timer:
    """Wall-clock step timer with device sync."""

    def __init__(self, sync=None):
        self.sync = sync
        self.samples: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        if self.sync is not None:
            self.sync()
        self.samples.append(time.perf_counter() - t0)

    def stats(self):
        t = np.asarray(self.samples)
        if len(t) == 0:
            return {}
        return {
            "n": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "median_ms": float(np.median(t) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope; view with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
