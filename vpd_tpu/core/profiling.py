"""Profiling and throughput instrumentation.

The reference has no tracing (SURVEY.md §5.1, tqdm only); here:
`trace` wraps a block in a jax.profiler trace (TensorBoard-viewable),
and `StepTimer` tracks steady-state step times / items-per-second — the
crops/sec counter is the framework's north-star metric.

NOTE (axon relay): dispatch is lazy, so timed sections must force a host
readback of a result; `StepTimer.step` takes an optional array to force.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace around a block: `with trace('/tmp/tb'): ...`"""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timing; skips the first `warmup` steps."""

    def __init__(self, items_per_step=1, warmup=2):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self.times = []
        self._count = 0
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def step(self, force_result=None):
        """Record one step; pass a device array to force execution."""
        if force_result is not None:
            np.asarray(force_result)
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_time(self):
        return float(np.mean(self.times)) if self.times else float('nan')

    @property
    def items_per_sec(self):
        t = self.mean_step_time
        return self.items_per_step / t if t and np.isfinite(t) else 0.

    def summary(self):
        return {
            'steps': len(self.times),
            'mean_step_ms': round(self.mean_step_time * 1e3, 3),
            'items_per_sec': round(self.items_per_sec, 1),
        }
