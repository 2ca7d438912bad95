"""Pallas fused grouped-SharedMLP + neighbourhood max-pool.

PointNet++ SA modules apply a pointwise MLP stack over ball-grouped
neighbourhoods and max-pool over the S samples. In XLA each layer reads and
writes the full (B*M, S, C) grouped tensor in HBM — at the RCNN SA0 geometry
(256 rois x 128 centers x 64 samples x 128 ch, bf16 = 537 MB) the mlp1 +
mlp2 + max chain measures 3.85 ms against a ~1.3 ms roofline (read the
grouped activations ONCE + 137 GFLOP of matmuls). This kernel streams
row-tiles of the grouped tensor through VMEM, applies an optional input
affine (the folded BN0 of the factored SharedMLP path) + ReLU, K dense
layers (+folded BN affines) each with ReLU, then the max over S — the
intermediate activations never touch HBM.

Semantics: out[b, m] = max_s mlpK(...(relu(x[b, m, s] * mul0 + add0))...)
matching SharedMLP's factored path + jnp.max(axis=2). Accumulation f32.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s, nlayers, x_ref, mul0_ref, add0_ref, *refs):
    wb = refs[: 2 * nlayers]
    out_ref = refs[2 * nlayers]
    rows = x_ref.shape[0]
    x = x_ref[...].astype(jnp.float32)
    x = jnp.maximum(x * mul0_ref[0] + add0_ref[0], 0.0).astype(jnp.bfloat16)
    for i in range(nlayers):
        w, b = wb[2 * i], wb[2 * i + 1]
        y = jnp.dot(x, w[...], preferred_element_type=jnp.float32)
        x = jnp.maximum(y + b[0], 0.0).astype(jnp.bfloat16)
    c = x.shape[-1]
    out_ref[...] = jnp.max(
        x.reshape(rows // s, s, c), axis=1
    ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("s", "tile_groups", "interpret"))
def grouped_mlp_max(
    x: jnp.ndarray,  # (G, S, C0) grouped pre-activation (post-mlp0) bf16
    mul0: jnp.ndarray,  # (C0,) input affine (folded BN0; ones/zeros if none)
    add0: jnp.ndarray,  # (C0,)
    weights,  # sequence of (W (Ci, Co), b (Co,)) f32/bf16, ReLU after each
    s: int | None = None,  # samples per group (= x.shape[1])
    tile_groups: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    g, s_, c0 = x.shape
    s = s_ if s is None else s
    nlayers = len(weights)
    c_last = weights[-1][0].shape[-1]
    tg = min(tile_groups, g)
    while g % tg:
        tg -= 1
    x2 = x.reshape(g * s, c0)

    in_specs = [
        pl.BlockSpec((tg * s, c0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2, mul0.reshape(1, c0).astype(jnp.float32),
            add0.reshape(1, c0).astype(jnp.float32)]
    for w, b in weights:
        ci, co = w.shape
        in_specs.append(
            pl.BlockSpec((ci, co), lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(w.astype(jnp.bfloat16))
        args.append(b.reshape(1, co).astype(jnp.float32))

    return pl.pallas_call(
        partial(_kernel, s, nlayers),
        grid=(g // tg,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tg, c_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, c_last), x.dtype),
        interpret=interpret,
    )(*args)
