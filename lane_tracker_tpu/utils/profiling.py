"""Tracing and throughput observability.

The reference has no profiling hooks at all (SURVEY §5: the only
performance artifact is a README disclaimer, README.md:12).  Here:

* :func:`maybe_profile` wraps a region in a ``jax.profiler`` trace
  (xprof/TensorBoard-compatible) when a directory is given.
* :func:`trace_annotation` names pipeline stages inside traces.
* :class:`FpsMeter` is a lightweight frames/sec meter for drivers.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def maybe_profile(trace_dir=None):
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(str(trace_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def trace_annotation(name: str):
    """Named region inside device traces (no-op overhead outside tracing)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class FpsMeter:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.frames = 0

    def add(self, n: int):
        self.frames += int(n)

    def fps(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.frames / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.perf_counter()
        self.frames = 0
