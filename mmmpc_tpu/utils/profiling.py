"""Tracing / profiling hooks.

The reference has none (tqdm imported but unused, SURVEY.md §5).  These are
thin wrappers over jax.profiler so solver stages show up as named ranges in
a TensorBoard/perfetto trace, plus a wall-clock section timer for host-side
phases.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named range in a device trace (no-op cost when not tracing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace into logdir (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating host-side wall-clock timer for named sections."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_s": v / self.counts[k]}
                for k, v in sorted(self.totals.items())}
