"""Profiling / tracing hooks.

The reference has only wall-clock FPS prints and per-iter MetricLogger
timing (SURVEY.md §5). TPU-native replacement: `jax.profiler` traces
viewable in TensorBoard/XProf, plus named annotations for the hot phases
(encode / decode / loss / update) and a simple step timer.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace for the enclosed steps."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace viewer."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Device-synchronized step timing (relay-safe: callers pass a scalar
    to block on, e.g. the loss)."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_scalar=None) -> float:
        if sync_scalar is not None:
            float(sync_scalar)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def p50(self):
        s = sorted(self.times)
        return s[len(s) // 2] if s else 0.0
