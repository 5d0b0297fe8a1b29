"""Profiling hooks.

Reference has only wall-clock dt metrics (SURVEY.md section 5); the TPU build
adds jax.profiler traces (viewable in TensorBoard / Perfetto) around any
run, plus a simple steps/sec meter.
"""
from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "Timer"]


@contextlib.contextmanager
def trace(logdir: str | None):
    """Context manager: capture a jax.profiler trace into `logdir` (no-op if
    logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Steps/sec meter with exponential moving average."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rate = None
        self._last = time.perf_counter()

    def tick(self, n: int = 1) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        r = n / dt if dt > 0 else 0.0
        self.rate = r if self.rate is None else (
            self.alpha * r + (1 - self.alpha) * self.rate)
        return self.rate
