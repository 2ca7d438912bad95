"""Pallas fused ball-query + neighbourhood gather + SharedMLP + max.

One kernel runs a whole SA scale per grid step: squared distances, the
first-S-in-radius selection AS A RANK-DERIVED ONE-HOT (no index tensor),
both neighbourhood gathers as VMEM-resident MXU dots, the factored mlp0
(feature columns pre-applied at the N source points, xyz columns on the
f32-centered coordinates), the BN0 affine + ReLU, the mlp1..k chain, and
the max over S. What this removes vs the XLA path (per-op attribution at
the RCNN SA0 geometry, /tmp/rc_attr3):
  - ball_query's reduce_sum/dot/convert chain (~1.4 ms) — distances are
    recomputed in VMEM per tile, the (B, M, S) index tensor never exists;
  - the grouped (B, M, S, C) tensors' HBM round-trips (the one-hot einsums
    wrote 537 MB at SA0, then the MLP read it back).
The one-hot contraction itself stays MXU work of the same shape — the
rank-one-hot form that regressed in XLA (materialized its (B, M*S, N)
operand in HBM, rcnn_net 15 -> 34 ms) is exactly what VMEM residency
fixes.

Semantics (oracle: ops/points.ball_query + group_points + SharedMLP
factored path + max): scan order = point index, strict < radius^2, empty
ball -> point 0, partial ball -> first neighbour repeated. Prefix ranks
count in f32 on the MXU (bf16 is exact only to 256; N can be 512+).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s, r2, mt, nlayers, *refs):
    xyz, ctr, v, w0x, mul0, add0 = refs[:6]
    wb = refs[6 : 6 + 2 * nlayers]
    out = refs[6 + 2 * nlayers]
    n = xyz.shape[1]
    m = ctr.shape[1]
    c0 = v.shape[-1]

    xyzv = xyz[0].astype(jnp.float32)  # (N, 3)
    vv = v[0]  # (N, C0) bf16
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)  # inclusive lower-tri: tri[k, n] = k <= n

    pooled = []
    for t0 in range(0, m, mt):
        c = ctr[0, t0 : t0 + mt].astype(jnp.float32)  # (mt, 3)
        d2 = jnp.zeros((mt, n), jnp.float32)
        for k in range(3):
            diff = c[:, k : k + 1] - xyzv[:, k].reshape(1, n)
            d2 = d2 + diff * diff
        mask = (d2 < r2).astype(jnp.float32)  # strict, as the CUDA kernel
        incl = jnp.dot(mask, tri, preferred_element_type=jnp.float32)
        rank = incl - mask  # exclusive prefix count, int-valued f32
        cnt = incl[:, n - 1 : n]  # (mt, 1)

        # target rank per slot: s' for s' < cnt (the s'-th neighbour),
        # else 0 (repeat the first); empty ball -> select point 0
        # Mosaic's tpu.iota only produces integers — iota in int32, then cast
        slots = jax.lax.broadcasted_iota(jnp.int32, (mt, s), 1).astype(jnp.float32)
        tgt = jnp.where(slots < cnt, slots, 0.0)  # (mt, s)
        onehot = (
            (rank[:, None, :] == tgt[:, :, None])
            * mask[:, None, :]
        )  # (mt, s, n) f32 0/1
        empty = (cnt[:, :, None] == 0.0).astype(jnp.float32)
        e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2) == 0)
        onehot = onehot * (1.0 - empty) + empty * e0.astype(jnp.float32)
        ohf = onehot.reshape(mt * s, n)  # f32 0/1
        oh = ohf.astype(jnp.bfloat16)

        # gathers as MXU dots (VMEM-resident); xyz in f32 — rounding raw
        # coordinates to bf16 BEFORE centering amplifies ~|x|/radius-fold
        # by cancellation (see SharedMLP factored-path docstring)
        gf = jnp.dot(oh, vv, preferred_element_type=jnp.float32)  # (mt*s, C0)
        gx = jnp.dot(ohf, xyzv, preferred_element_type=jnp.float32)  # (mt*s, 3)
        # center in f32 BEFORE the bf16 cast (cancellation), as the factored
        # XLA path does; then the 3 xyz columns of mlp0 unrolled on the VPU
        # in bf16, matching _SlicedDense's arithmetic exactly
        cx = jnp.repeat(c, s, axis=0)  # (mt*s, 3)
        ctd = (gx - cx).astype(jnp.bfloat16)
        # sum the 3 xyz terms FIRST, then add to the gather — matches the
        # XLA factored path's bf16 association (t0+t1)+t2 (bf16 addition is
        # non-associative; at empty-ball far-center magnitudes the other
        # order differs visibly)
        pos = None
        for k in range(3):
            t = ctd[:, k : k + 1] * w0x[k].reshape(1, c0).astype(jnp.bfloat16)
            pos = t if pos is None else pos + t
        x = gf.astype(jnp.bfloat16) + pos
        x = jnp.maximum(
            x.astype(jnp.float32) * mul0[0] + add0[0], 0.0
        ).astype(jnp.bfloat16)
        for i in range(nlayers):
            wgt, b = wb[2 * i], wb[2 * i + 1]
            y = jnp.dot(x, wgt[...], preferred_element_type=jnp.float32)
            x = jnp.maximum(y + b[0], 0.0).astype(jnp.bfloat16)
        pooled.append(jnp.max(x.reshape(mt, s, -1), axis=1))
    out[...] = jnp.concatenate(pooled, axis=0)[None].astype(out.dtype)


@partial(jax.jit,
         static_argnames=("radius", "s", "m_tile", "interpret"))
def sa_ball_mlp_max(
    xyz: jnp.ndarray,  # (B, N, 3) f32 source points
    centers: jnp.ndarray,  # (B, M, 3) f32 query centers
    v: jnp.ndarray,  # (B, N, C0) bf16 — mlp0 feature cols applied + bias
    w0x: jnp.ndarray,  # (3, C0) mlp0 xyz columns
    mul0: jnp.ndarray,  # (C0,) folded BN0 scale (ones if no BN)
    add0: jnp.ndarray,  # (C0,) folded BN0 shift
    weights,  # sequence of (W (Ci, Co), b (Co,)); ReLU after each
    radius: float,
    s: int,
    m_tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    b, n, _ = xyz.shape
    m = centers.shape[1]
    c0 = v.shape[-1]
    nlayers = len(weights)
    c_last = weights[-1][0].shape[-1]
    mt = min(m_tile, m)
    while m % mt:
        mt -= 1

    in_specs = [
        pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, c0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [
        xyz, centers, v.astype(jnp.bfloat16), w0x,
        mul0.reshape(1, c0).astype(jnp.float32),
        add0.reshape(1, c0).astype(jnp.float32),
    ]
    for wgt, bias in weights:
        ci, co = wgt.shape
        in_specs.append(pl.BlockSpec((ci, co), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, co), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(wgt.astype(jnp.bfloat16))
        args.append(bias.reshape(1, co).astype(jnp.float32))

    return pl.pallas_call(
        partial(_kernel, s, float(radius) * float(radius), mt, nlayers),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, m, c_last), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c_last), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
