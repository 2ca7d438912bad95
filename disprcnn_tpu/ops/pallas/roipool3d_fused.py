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


def _split_runs(cv, sp):
    """Ordered runs of the output channel space: (is_split, start, stop)."""
    runs = []
    for c in range(cv):
        is_sp = c in sp
        if runs and runs[-1][0] == is_sp and runs[-1][2] == c:
            runs[-1] = (is_sp, runs[-1][1], c + 1)
        else:
            runs.append((is_sp, c, c + 1))
    return runs


def _kernel(s, max_dis, s_tile, rboxes, cv, sp, *refs):
    """`sp` (static): vals-channel indices that arrive as an exact
    hi/mid/lo bf16 3-split inside `valsb`; every other channel's stored
    value is already exactly bf16-representable (caller knowledge: bf16
    feature maps, 0/1 masks), so the big per-slot gather runs as ONE bf16
    one-hot dot at 4x the f32 MXU rate (r5: the f32 dot was 104 MFLOP/box
    at quarter rate — roipool3d was 5.97 ms of the reference-budget stage
    3). Bit-identical to the f32 dot: a one-hot row selects exactly one
    term, each 8-bit mantissa slice is exact, and (hi+mid)+lo
    reconstructs the f32 value exactly. The split is computed in XLA
    (roipool3d_fused wrapper), NOT here: computing it in-kernel measured
    3.9e-3 of parity error on real Mosaic — the VPU's excess-precision
    fusion elides the bf16 round-trips, so hi absorbs the full value and
    mid/lo collapse to zero until the single store rounds it (r5a queue,
    2026-08-20). bf16 kernel INPUTS are storage — nothing to elide."""
    pts, valsb, box, out = refs
    n = pts.shape[1]
    ns = len(sp)

    p = pts[0].astype(jnp.float32)  # (N, 3)
    x, y, z = p[:, 0].reshape(1, n), p[:, 1].reshape(1, n), p[:, 2].reshape(1, n)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)
    runs = _split_runs(cv, sp)
    vb = valsb[0]  # (N, 3S+E) bf16: [hi | mid | lo | exact-channel runs]

    # rboxes boxes per grid step: the per-step work of ONE box (a few
    # hundred-kFLOP dots) is far below the grid-step overhead.
    # Phase 1 — ALL boxes' in-box masks, then ONE (rboxes, N) tri dot:
    # a 1-row dot costs a full 128-row MXU output tile, so the per-box
    # form paid 8x the tile cost for the same prefix counts (~1 ms of the
    # reference-budget segment, r5l trace arithmetic).
    mask_rows = []
    for r in range(rboxes):
        b = box[0, r].astype(jnp.float32)  # (7,)
        cx, by, cz, h, w, l, ry = (b[i] for i in range(7))
        cy = by - h * 0.5
        dx, dy, dz = x - cx, y - cy, z - cz
        cosa, sina = jnp.cos(ry), jnp.sin(ry)
        x_rot = dx * cosa - dz * sina
        z_rot = dx * sina + dz * cosa
        mask_rows.append((
            (jnp.abs(dx) <= max_dis)
            & (jnp.abs(dy) <= h * 0.5)
            & (jnp.abs(dz) <= max_dis)
            & (x_rot >= -l * 0.5) & (x_rot <= l * 0.5)
            & (z_rot >= -w * 0.5) & (z_rot <= w * 0.5)
        ).astype(jnp.float32))  # (1, N)
    masks = (mask_rows[0] if rboxes == 1
             else jnp.concatenate(mask_rows, axis=0))  # (rboxes, N)
    incl_all = jnp.dot(masks, tri, preferred_element_type=jnp.float32)

    for r in range(rboxes):
        mask = mask_rows[r]
        incl = incl_all[r : r + 1]
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
            # valsb f32 (DISPRCNN_ROIPOOL_F32DOT A/B) -> the pre-r5 f32
            # dot exactly; bf16 valsb -> the 4x-rate split dot
            g = jnp.dot(onehot.astype(vb.dtype), vb,
                        preferred_element_type=jnp.float32)  # (st, 3S+E)
            # ns == 0 (the f32dot A/B): zero-width slices are illegal in
            # Mosaic vector types — no split columns to combine
            comb = (None if ns == 0 else
                    (g[:, :ns] + g[:, ns : 2 * ns]) + g[:, 2 * ns : 3 * ns])
            parts = []
            isp = iex = 0
            for is_sp, a, b in runs:
                w_ = b - a
                if is_sp:
                    parts.append(comb[:, isp : isp + w_])
                    isp += w_
                else:
                    parts.append(g[:, 3 * ns + iex : 3 * ns + iex + w_])
                    iex += w_
            out[r, t0 : t0 + st] = jnp.concatenate(
                parts, axis=1).astype(out.dtype)


@partial(jax.jit, static_argnames=("sampled_pts_num", "max_dis", "interpret",
                                   "f32_channels"))
def roipool3d_fused(
    pts: jnp.ndarray,  # (B, N, 3) f32
    feats: jnp.ndarray,  # (B, N, C)
    boxes3d: jnp.ndarray,  # (B, M, 7)
    sampled_pts_num: int = 512,
    max_dis: float = 10.0,
    interpret: bool = False,
    f32_channels=None,
):
    """-> pooled (B, M, S, 3 + C) f32, empty (B, M) bool. Matches
    ops/roipool3d.roipool3d exactly up to the hi/lo gather's ~2^-17
    rounding (this kernel reconstructs exact f32 values from a bf16
    hi/mid/lo split — see _kernel).

    f32_channels: static tuple of FEATS channel indices whose values need
    the exact 3-split (None = all of them — always safe). Channels NOT
    listed must hold exactly-bf16-representable values (bf16 feature
    maps, 0/1 masks) — they ride the bf16 gather dot as single rows,
    keeping the dot near the minimal 3+C lane count. xyz is always
    split."""
    bsz, n, _ = pts.shape
    m = boxes3d.shape[1]
    s = sampled_pts_num
    cf = feats.shape[-1]
    if f32_channels == "f32dot":
        # A/B fallback: the pre-r5 f32 gather dot (no split, quarter MXU
        # rate). Selected via DISPRCNN_ROIPOOL_F32DOT at the MODEL call
        # site (rcnn3d) — encoding it in this STATIC arg keeps the inner
        # jit cache honest when an A/B harness flips the env per config.
        sp = ()
    else:
        if f32_channels is None:
            f32_channels = tuple(range(cf))
        sp = tuple(range(3)) + tuple(sorted(3 + c for c in f32_channels))
    cv = 3 + cf
    ns = len(sp)
    # hi/mid/lo split built HERE in XLA (in-kernel it measured 3.9e-3 of
    # on-chip parity error — Mosaic's excess-precision fusion elides the
    # bf16 round-trips; see _kernel docstring). The bf16 blocks cross the
    # pallas boundary as storage, which forces the rounding.
    vals = jnp.concatenate([pts.astype(jnp.float32),
                            feats.astype(jnp.float32)], axis=-1)
    runs = _split_runs(cv, sp)
    blocks = []
    if ns:
        vsp = jnp.concatenate(
            [vals[..., c : c + 1] for c in sp], axis=-1)  # (B, N, S)
        hi = vsp.astype(jnp.bfloat16)
        r1 = vsp - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        blocks += [hi, mid, lo]
    ex_runs = [(a, b) for is_sp, a, b in runs if not is_sp]
    ex_dt = jnp.float32 if not sp else jnp.bfloat16  # f32 only in the A/B
    if ex_runs:
        blocks.append(jnp.concatenate(
            [vals[..., a:b] for a, b in ex_runs], axis=-1
        ).astype(ex_dt))  # exact bf16 values (f32 in the F32DOT A/B)
    valsb = jnp.concatenate(blocks, axis=-1)  # (B, N, 3S+E)
    rb = valsb.shape[-1]
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
        partial(_kernel, s, float(max_dis), s_tile, rboxes, cv, sp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, 3), lambda i: (i // gsteps, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, rb), lambda i: (i // gsteps, 0, 0),
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
    )(pts, valsb, boxes_p)
    # empty flags via the cheap XLA mask-count (B*M*N compares): an
    # (rboxes, 1) kernel output block violates Mosaic's sublane tiling rule
    # whenever rboxes < 8 (small-M callers / the bench canary)
    from ..roipool3d import pts_in_boxes3d

    mask = jax.vmap(lambda p, b: pts_in_boxes3d(p, b, max_dis))(
        pts, boxes3d.reshape(bsz, m, 7))  # (B, M, N)
    empty = ~jnp.any(mask, axis=-1)
    return pooled.reshape(bsz, mp, s, 3 + cf)[:, :m], empty
