"""Tracing / profiling (SURVEY.md §5: replaces the reference's wall-clock
Timer + torch.cuda.synchronize hand-timers with jax.profiler traces).

- `trace(dir)` context manager captures a TensorBoard-viewable XLA trace.
- `StepTimer` measures steady-state step latency with explicit
  block_until_ready (device-async aware, unlike the reference's Timer).
- `device_memory_stats()` reports live HBM usage per device.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Median step latency over a sliding window, async-safe."""

    def __init__(self, window: int = 20):
        self.window = window
        self.samples: list[float] = []

    def timed(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.samples.append(dt)
        self.samples = self.samples[-self.window :]
        return out, dt

    @property
    def median(self) -> float:
        s = sorted(self.samples)
        return s[len(s) // 2] if s else 0.0


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
