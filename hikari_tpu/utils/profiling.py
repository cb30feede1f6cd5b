"""Tracing/profiling (SURVEY.md §5): named per-pass scopes + device traces.

The reference only has two `info_span!` scopes behind a disabled feature
gate (prepass.rs:789-790, overlay.rs:360-361); here per-pass profiling is
first-class since frame-ms is the headline metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


def pass_scope(name: str):
    """Annotate a pipeline pass; shows up in XLA/profiler traces."""
    return jax.named_scope(name)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with
    tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 1):
    """Steady-state wall time of a jitted function (ms)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


class FrameTimer:
    """Rolling per-frame wall-clock stats for interactive drivers."""

    def __init__(self, window: int = 60):
        self.window = window
        self.samples = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append(now - self._last)
            if len(self.samples) > self.window:
                self.samples.pop(0)
        self._last = now

    @property
    def ms(self) -> float:
        if not self.samples:
            return 0.0
        return sum(self.samples) / len(self.samples) * 1e3
