"""Profiling & tracing utilities.

The reference's only observability is wall-clock prints (SURVEY.md s5).
Here: a ``jax.profiler`` trace context for TensorBoard-compatible device
traces, named annotations, and a simple step timer with percentile summary
for latency work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock samples per phase; reports min/median/p90."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.setdefault(name, []).append(
                time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            xs = sorted(xs)
            n = len(xs)
            out[name] = {
                "n": n,
                "min": xs[0],
                "median": xs[n // 2],
                "p90": xs[min(n - 1, int(0.9 * n))],
            }
        return out
