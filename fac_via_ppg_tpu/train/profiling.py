"""Profiling hooks.

The reference's only instrumentation is wall-clock per iteration
(train_ppg2mel.py:233,260).  This module adds first-class TPU tracing via
jax.profiler: set hparams.profile_dir (or wrap any region) and open the
trace in TensorBoard / Perfetto / xprof.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(profile_dir: str):
    """Capture a device trace for the enclosed region ('' disables)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-iteration timing (the reference's 'duration' scalar),
    plus simple EMA smoothing for console output."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self._start
        self.ema = (
            self.duration
            if self.ema is None
            else (1 - self.alpha) * self.ema + self.alpha * self.duration
        )
        return False
