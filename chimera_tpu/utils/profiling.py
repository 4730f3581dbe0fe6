"""Profiling and timing hooks (reference has none — SURVEY.md 5.1).

Thin wrappers over ``jax.profiler`` plus wall-clock stage timers, so runs can
report per-stage compile/execute time and capture device traces for xprof.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

from chimera_tpu.config import logger


@dataclass
class StageTimer:
    """Accumulates wall-clock per named stage; blocks on device results."""

    times: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def time_fn(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self) -> str:
        lines = [f"{k}: {v:.4f}s (n={self.counts[k]})"
                 for k, v in sorted(self.times.items())]
        msg = "; ".join(lines)
        logger.info("timing: %s", msg)
        return msg


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an xprof/TensorBoard trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compile_time(fn, *args) -> float:
    """Wall-clock of one cold jit compile (AOT lower+compile)."""
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    return time.perf_counter() - t0
