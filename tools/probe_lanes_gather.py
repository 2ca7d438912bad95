"""One-off probe: which lane-axis dynamic_gather forms real Mosaic accepts.

r4 established the SUBLANE-gather limits on v5e (table <= 1 vreg along the
gathered dim => 8 rows f32; idx/result bitwidths must match). The r5 lanes
SA kernel (sa_fused._kernel_l) bets the LANE-axis limit is 128. Each form
below compiles + runs + checks parity vs numpy; failures print the Mosaic
error head and continue.

Forms:
  a. (128, 128) f32 table, i32 idx, axis=1   — the SA kernel's big gather
  b. (8, 128) f32                            — single sublane-vreg table
  c. (3, 128) f32, idx broadcast from (1,128) — the xyz-table form
  d. (128, 128) bf16 table, i16 idx          — the DISPRCNN_SA_LG16 form
  e. (128, 256) f32 table, axis=1            — 2 vregs along gather dim
                                               (expect reject if the
                                               sublane rule generalizes)
"""
import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

rng = np.random.default_rng(0)


def run(name, rows, lanes, tdt, idt, idx_rows=None, out_lanes=None):
    out_lanes = out_lanes or lanes
    tbl = rng.normal(size=(rows, lanes)).astype(np.float32)
    if tdt == jnp.bfloat16:
        tbl = tbl.astype(jnp.bfloat16).astype(np.float32)
    idx = rng.integers(0, lanes, size=(idx_rows or rows, out_lanes))

    def kernel(t_ref, i_ref, o_ref):
        t = t_ref[...]
        i = i_ref[...]
        if i.shape[0] != t.shape[0]:
            i = jnp.broadcast_to(i, (t.shape[0], i.shape[1]))
        o_ref[...] = jnp.take_along_axis(t, i, axis=1).astype(jnp.float32)

    try:
        got = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, out_lanes), jnp.float32),
        )(jnp.asarray(tbl, tdt), jnp.asarray(idx, idt))
        got = np.asarray(got)
        want = np.take_along_axis(
            tbl, np.broadcast_to(idx, (rows, out_lanes)), axis=1)
        ok = np.array_equal(got, want.astype(np.float32))
        print(f"{name}: RAN, parity={'EXACT' if ok else 'WRONG'}"
              + ("" if ok else f" maxerr={np.abs(got - want).max()}"),
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:180]
        print(f"{name}: FAILED — {msg}", flush=True)


def probe_vec_reshape():
    """(n,1) -> (1,n) vector reshape (sublanes -> lanes): needed by a
    bisect-lanes search variant (pos columns -> idx rows). The row-major
    _kernel uses this pattern but may never have met real Mosaic."""
    v = rng.normal(size=(128, 1)).astype(np.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(1, 128) * 2.0

    try:
        got = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )(jnp.asarray(v))
        ok = np.array_equal(np.asarray(got), (v * 2).reshape(1, 128))
        print(f"f vec reshape (128,1)->(1,128): RAN, "
              f"parity={'EXACT' if ok else 'WRONG'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"f vec reshape: FAILED — {str(e).splitlines()[0][:180]}",
              flush=True)


if __name__ == "__main__":
    run("a f32/i32 (128,128)", 128, 128, jnp.float32, jnp.int32)
    run("b f32/i32 (8,128)", 8, 128, jnp.float32, jnp.int32)
    run("c f32/i32 (3,128) idx bcast", 3, 128, jnp.float32, jnp.int32,
        idx_rows=1)
    run("d bf16/i16 (128,128)", 128, 128, jnp.bfloat16, jnp.int16)
    run("e f32/i32 (128,256) 2-vreg", 128, 256, jnp.float32, jnp.int32)
    probe_vec_reshape()
    # timing probe: 64 chained gathers of form (a) in one kernel — rough
    # per-vreg-gather cost for the SA kernel's budget math
    import time

    def kt(t_ref, i_ref, o_ref):
        acc = jnp.zeros_like(t_ref[...], jnp.float32)
        for k in range(64):
            g = jnp.take_along_axis(
                t_ref[...], (i_ref[...] + k) % 128, axis=1)
            acc = acc + g.astype(jnp.float32)
        o_ref[...] = acc

    try:
        f = jax.jit(lambda t, i: pl.pallas_call(
            kt,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(t, i))
        t = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
        i = jnp.asarray(rng.integers(0, 128, size=(128, 128)), jnp.int32)
        float(jnp.sum(f(t, i)))
        n = 200
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(n):
            s += float(jnp.sum(f(t, i)))
        dt = (time.perf_counter() - t0) / n
        # 64 gathers x 16 vregs each = 1024 vreg-gathers per call
        print(f"timing: {dt * 1e6:.1f} us/call for 1024 vreg-gathers "
              f"(~{dt * 1e9 / 1024:.2f} ns/vreg-gather, readback-dominated "
              f"— relative only)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"timing probe FAILED — {str(e).splitlines()[0][:180]}")
