"""Pallas furthest-point-sampling kernel.

FPS is inherently sequential (npoint iterations of min-distance update +
argmax), so the XLA fori_loop version pays HBM round-trips per iteration.
This kernel keeps the clouds and the running min-distances in VMEM and
processes 8 batch rows per grid step (sublane-vectorized): lanes = points,
sublanes = batch.

Selection semantics match ops.points.furthest_point_sample / the reference
CUDA kernel (sampling_gpu.cu): seed index 0, ties -> lowest index.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # minimum batch rows per grid step (one f32 sublane tile)
MAX_ROWS = 64  # default cap: VMEM working set stays ~1 MB at N=768


def _max_rows() -> int:
    """DISPRCNN_FPS_ROWS: rows per grid step. The npoint loop is the
    SEQUENTIAL depth — total dependent iterations = (B/rows)*npoint, so
    more rows per step shortens the latency chain proportionally (the
    VPU vectorizes the extra sublanes). Read at trace time."""
    import os

    return int(os.environ.get("DISPRCNN_FPS_ROWS", str(MAX_ROWS)))


def _fps_kernel(npoint: int, n: int, rows: int, xyz_ref, out_ref, mind):
    # xyz (rows, 3, N); out (rows, npoint) int32; mind (rows, N) scratch
    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, npoint), 1)
    mind[...] = jnp.full((rows, n), 1e10, jnp.float32)
    out_ref[...] = jnp.zeros((rows, npoint), jnp.int32)  # slot 0 = seed 0

    def body(i, last):
        onehot = (lanes == last[:, None]).astype(jnp.float32)
        xl = jnp.sum(x * onehot, axis=1, keepdims=True)
        yl = jnp.sum(y * onehot, axis=1, keepdims=True)
        zl = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = (x - xl) ** 2 + (y - yl) ** 2 + (z - zl) ** 2
        m = jnp.minimum(mind[...], d)
        mind[...] = m
        # argmax with lowest-index tie-break, spelled as max + masked min:
        # mosaic's argmax lowering trips an i32/f32 cast bug on-device
        mx = jnp.max(m, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(m >= mx, lanes, n), axis=1).astype(jnp.int32)
        # dynamic-lane store via one-hot accumulate
        out_ref[...] = out_ref[...] + nxt[:, None] * (out_lanes == i)
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((rows,), jnp.int32))


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(
    xyz: jnp.ndarray, npoint: int, interpret: bool = False
) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32, VMEM-resident sequential FPS."""
    b, n, _ = xyz.shape
    # rows per grid step: the npoint-long loop is sequential, so fewer grid
    # steps = proportionally less loop/step overhead. Widen the sublane tile
    # up to MAX_ROWS (the VPU vectorizes over all of them for free).
    rows = min(_max_rows(), max(ROWS, -(-b // ROWS) * ROWS))
    pad = (-b) % rows
    xt = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)  # (B, 3, N)
    if pad:
        xt = jnp.concatenate([xt, jnp.zeros((pad, 3, n), jnp.float32)], axis=0)
    kernel = partial(_fps_kernel, npoint, n, rows)
    out = pl.pallas_call(
        kernel,
        grid=((b + pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((rows, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, n), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[:b]
