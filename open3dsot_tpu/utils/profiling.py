"""Profiling / tracing utilities.

The reference ships no profiling subsystem (SURVEY §5). Here:
- `trace(logdir)` — context manager around jax.profiler: captures a device
  trace viewable in TensorBoard/Perfetto/xprof.
- `annotate(name)` — TraceAnnotation for labeling host spans inside a trace.
- `Stopwatch` — lightweight named wall-clock accumulators for the host
  pipeline (sampler vs device-step attribution).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

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


class Stopwatch:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }
