"""Profiling / tracing harness (SURVEY §5: the reference had only wall-clock
prints; here timing and device traces are first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


class StageTimer:
    """Accumulates wall-clock per named stage with block_until_ready fencing."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_ref=None):
        t0 = time.perf_counter()
        yield
        if result_ref is not None:
            jax.block_until_ready(result_ref)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in sorted(self.totals)}

    def report(self) -> str:
        return "  ".join(f"{k}={v * 1e3:.1f}ms"
                         for k, v in self.summary().items())


def time_fn(f: Callable, *args, iters: int = 10, warmup: int = 2,
            **kw) -> float:
    """Mean seconds per call with device fencing."""
    for _ in range(warmup):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
