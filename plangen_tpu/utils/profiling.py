"""Profiling / tracing hooks.

The reference has no active tracing (a commented torch.profiler block,
train.py:228-234). Here tracing is first-class: `trace()` wraps a region in a
jax.profiler trace (viewable in Perfetto / TensorBoard), `annotate()` names
sub-regions on the TPU timeline, and `StepTimer` tracks host-side step
latency percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region.

    View with `tensorboard --logdir <log_dir>` or upload the .trace to
    Perfetto. On the TPU this includes per-op device timelines.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region on the profiler timeline (also a context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side step latency tracker with percentile summary."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)

        def pct(p):
            return ts[min(len(ts) - 1, int(p * len(ts)))]

        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "p50_s": pct(0.5),
            "p90_s": pct(0.9),
            "max_s": ts[-1],
        }
