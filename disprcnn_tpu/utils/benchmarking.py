"""Correct device timing over the axon TPU tunnel.

`jax.block_until_ready` is a NO-OP over the tunnel (verified: a 22 ms matmul
"completes" in 0.08 ms), so naive timing only measures dispatch. The only
reliable sync is a host readback. `device_timeit` folds the output to one
scalar inside the jitted function and reads it back once per repetition
block, subtracting the measured roundtrip floor (~34 ms here).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _scalarize(out):
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    acc = jnp.float32(0)
    for l in leaves:
        acc = acc + jnp.sum(l).astype(jnp.float32)
    return acc


def make_timed(fn: Callable) -> Callable:
    """Wrap fn so it returns a single f32 scalar (forces full execution)."""
    def timed(*args):
        return _scalarize(fn(*args))

    return jax.jit(timed)


def roundtrip_floor(device=None, n: int = 10) -> float:
    """Seconds per host<->device scalar readback."""
    x = jnp.zeros((), jnp.float32)
    if device is not None:
        x = jax.device_put(x, device)
    f = jax.jit(lambda v: v + 1)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(f(x))
    return (time.perf_counter() - t0) / n


_PEAK_BF16_FLOPS = {
    # peak dense bf16 FLOP/s per chip by device_kind (public TPU specs)
    "tpu v4": 275e12,
    "tpu v5 lite": 197e12,
    "tpu v5e": 197e12,
    "tpu v5p": 459e12,
    "tpu v5": 459e12,
    "tpu v6e": 918e12,
    "tpu v6 lite": 918e12,
}


def compiled_flops(fn: Callable, *args) -> float:
    """HLO FLOPs XLA schedules for one fn(*args) call (its own cost model)."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def peak_flops(device=None) -> float:
    """Peak bf16 FLOP/s of the (first) device, 0 if unknown."""
    d = device or jax.devices()[0]
    return _PEAK_BF16_FLOPS.get(getattr(d, "device_kind", "").lower(), 0.0)


def device_timeit(fn: Callable, *args, n: int = 20, warmup: int = 2) -> float:
    """Milliseconds per call of fn(*args), tunnel-safe.

    Chains n dependent executions (each consumes the previous scalar so the
    queue cannot reorder/absorb them) and reads back once.
    """
    timed = make_timed(fn)
    for _ in range(warmup):
        s = timed(*args)
    float(s)
    floor = roundtrip_floor()
    t0 = time.perf_counter()
    for _ in range(n):
        s = timed(*args)
    float(s)
    dt = time.perf_counter() - t0 - floor
    return max(dt, 0.0) / n * 1000.0
