"""Profiling & tracing utilities (SURVEY.md §5 "Tracing / profiling").

The reference has only a wall-clock print per CLI turn (cli.py:147-162).
Here tracing is first-class:

- `phase(name)`: context manager timing a pipeline phase (preprocess /
  vision / projector / prefill / decode), aggregated into `PhaseStats`
- `trace(dir)`: jax.profiler device trace (open in TensorBoard/XProf)
- `annotate(name)`: jax.profiler.TraceAnnotation for device-timeline labels
- `Timings.summary()`: per-phase p50/p95/mean for serving metrics
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict

import jax


class PhaseStats:
    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        """Times a host-side phase; pass a jax array as `block_on` to
        include device completion."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.samples[name].append(seconds)

    def summary(self) -> dict:
        out = {}
        for name, xs in self.samples.items():
            xs_sorted = sorted(xs)
            out[name] = {
                "count": len(xs),
                "mean_ms": 1e3 * statistics.fmean(xs),
                "p50_ms": 1e3 * xs_sorted[len(xs) // 2],
                "p95_ms": 1e3 * xs_sorted[min(len(xs) - 1, int(len(xs) * 0.95))],
                "total_s": sum(xs),
            }
        return out

    def reset(self):
        self.samples.clear()


GLOBAL_STATS = PhaseStats()
phase = GLOBAL_STATS.phase


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler; view with TensorBoard → Profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region on the device timeline."""
    return jax.profiler.TraceAnnotation(name)
