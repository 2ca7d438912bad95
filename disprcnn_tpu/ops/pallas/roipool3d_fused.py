"""Pallas fused 3D ROI pooling: in-box test + first-k-cycled one-hot gather.

One grid step per (batch, box): the canonical-frame point-in-box mask, the
first-`S`-in-scan-order selection WITH the reference's tail cycling
(slot % cnt, roipool3d_kernel.cu:58-76) as a rank-derived one-hot, and the
xyz+feature gather as VMEM-resident MXU dots (xyz in f32 for geometry
accuracy — no hi/lo split needed in-kernel). Replaces the XLA chain of
pts_in_boxes3d + first_k_true + the bf16 hi/lo double-width one-hot gather
(ops/roipool3d.py), whose intermediates round-trip HBM.

Ranks count in f32 on the MXU (triangle matmul; bf16 is exact only to 256,
k is 512).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s, max_dis, s_tile, rboxes, *refs):
    pts, feats, box, out = refs
    n = pts.shape[1]

    p = pts[0].astype(jnp.float32)  # (N, 3)
    x, y, z = p[:, 0].reshape(1, n), p[:, 1].reshape(1, n), p[:, 2].reshape(1, n)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)
    vals = jnp.concatenate([p, feats[0].astype(jnp.float32)], axis=-1)

    # rboxes boxes per grid step: the per-step work of ONE box (a few
    # hundred-kFLOP dots) is far below the grid-step overhead
    for r in range(rboxes):
        b = box[0, r].astype(jnp.float32)  # (7,)
        cx, by, cz, h, w, l, ry = (b[i] for i in range(7))
        cy = by - h * 0.5
        dx, dy, dz = x - cx, y - cy, z - cz
        cosa, sina = jnp.cos(ry), jnp.sin(ry)
        x_rot = dx * cosa - dz * sina
        z_rot = dx * sina + dz * cosa
        mask = (
            (jnp.abs(dx) <= max_dis)
            & (jnp.abs(dy) <= h * 0.5)
            & (jnp.abs(dz) <= max_dis)
            & (x_rot >= -l * 0.5) & (x_rot <= l * 0.5)
            & (z_rot >= -w * 0.5) & (z_rot <= w * 0.5)
        ).astype(jnp.float32)  # (1, N)

        incl = jnp.dot(mask, tri, preferred_element_type=jnp.float32)
        rank = incl - mask
        cnt = incl[:, n - 1 : n]  # (1, 1); broadcasts against (st, 1) slots

        # (slots are processed in s_tile chunks to bound the (st, N) one-hot)
        for t0 in range(0, s, s_tile):
            st = min(s_tile, s - t0)
            # Mosaic's tpu.iota only produces integers — iota int32, then cast
            slots = t0 + jax.lax.broadcasted_iota(
                jnp.int32, (st, 1), 0).astype(jnp.float32)
            # reference tail cycling: slot % cnt once past the found count.
            # The TPU VPU divide is NOT correctly rounded (reciprocal-based,
            # ~2 ULP): at exact multiples floor(slot/cnt) can come up one
            # short (e.g. 33/33 -> 0.99999994 -> 0), leaving cyc == cnt which
            # matches no rank and silently zeroes the slot. Correct the
            # remainder into [0, cnt) — the quotient error is at most 1.
            cyc = slots - cnt * jnp.floor(slots / jnp.maximum(cnt, 1.0))
            cyc = jnp.where(cyc >= cnt, cyc - cnt, cyc)
            cyc = jnp.where(cyc < 0.0, cyc + cnt, cyc)
            tgt = jnp.where(slots < cnt, slots, cyc)
            onehot = (rank == tgt) * mask  # (st, N), empty box -> all 0
            g = jnp.dot(onehot, vals, preferred_element_type=jnp.float32)
            out[r, t0 : t0 + st] = g.astype(out.dtype)


@partial(jax.jit, static_argnames=("sampled_pts_num", "max_dis", "interpret"))
def roipool3d_fused(
    pts: jnp.ndarray,  # (B, N, 3) f32
    feats: jnp.ndarray,  # (B, N, C)
    boxes3d: jnp.ndarray,  # (B, M, 7)
    sampled_pts_num: int = 512,
    max_dis: float = 10.0,
    interpret: bool = False,
):
    """-> pooled (B, M, S, 3 + C) f32, empty (B, M) bool. Matches
    ops/roipool3d.roipool3d exactly up to the hi/lo gather's ~2^-17
    rounding (this kernel gathers in f32)."""
    bsz, n, _ = pts.shape
    m = boxes3d.shape[1]
    s = sampled_pts_num
    cf = feats.shape[-1]
    s_tile = min(s, 256)
    # Mosaic legality for the (1, rboxes, 7) box block: the second-to-last
    # dim must be 8-divisible or equal the overall M. Padding M up to a
    # multiple of 8 makes rboxes=8 legal for ANY M (pad boxes are all-zero
    # -> empty -> zero rows, sliced away below).
    rboxes = 8
    mp = -(-m // rboxes) * rboxes
    boxes_p = (boxes3d if mp == m else jnp.concatenate(
        [boxes3d, jnp.zeros((bsz, mp - m, 7), boxes3d.dtype)], axis=1))
    gsteps = mp // rboxes

    grid = (bsz * gsteps,)
    pooled = pl.pallas_call(
        partial(_kernel, s, float(max_dis), s_tile, rboxes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda i: (i // gsteps, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cf), lambda i: (i // gsteps, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rboxes, 7),
                         lambda i: (i // gsteps, i % gsteps, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rboxes, s, 3 + cf), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * mp, s, 3 + cf), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(pts, feats, boxes_p)
    # empty flags via the cheap XLA mask-count (B*M*N compares): an
    # (rboxes, 1) kernel output block violates Mosaic's sublane tiling rule
    # whenever rboxes < 8 (small-M callers / the bench canary)
    from ..roipool3d import pts_in_boxes3d

    mask = jax.vmap(lambda p, b: pts_in_boxes3d(p, b, max_dis))(
        pts, boxes3d.reshape(bsz, m, 7))  # (B, M, N)
    empty = ~jnp.any(mask, axis=-1)
    return pooled.reshape(bsz, mp, s, 3 + cf)[:, :m], empty
