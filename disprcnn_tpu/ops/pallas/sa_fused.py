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

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_transposed() -> bool:
    return os.environ.get("DISPRCNN_SA_T", "1") != "0"


def _ranks_cumsum() -> bool:
    """Prefix ranks via an in-kernel cumsum over the N (sublane) axis
    (Hillis-Steele log-shift scan) instead of the (N, N) triangular bf16
    matmul — the tri-dot is ~14% of the SA0 mega-kernel's MXU flops
    (512^2 x mt per tile) and the counts are small exact integers either
    way. Default ON since the r4h on-chip A/B (tools/ab_stage3.py,
    2026-08-20): xfold+cumsum is best at BOTH budgets (rcnn 35.77->34.44 ms
    at the 1600-ROI reference budget, rpn3d 4.66->4.31)."""
    return os.environ.get("DISPRCNN_SA_RANKS", "cumsum") == "cumsum"


def _xfold() -> bool:
    """Fold the 9 hi/mid/lo xyz rows INTO the feature operand so the two
    selection dots become ONE (C0+9, N) x (N, L) dot. The standalone
    g3 = (9, N) x (N, L) dot has 9 output rows — the MXU processes output
    row-tiles of 128, so it costs nearly as much as the full C0=128 feature
    dot while carrying 7% of its flops. Bit-identical: dot output rows are
    independent. Default ON since the r4h on-chip A/B (2026-08-20,
    bit-exact parity in kernel_smoke): rcnn 5.68->5.09 ms at the headline
    budget, 35.77->34.44 (with cumsum) at the reference budget."""
    return os.environ.get("DISPRCNN_SA_XFOLD", "1") == "1"


def _fold_v_transpose() -> bool:
    """Take v as (B, N, C0) blocks and contract over N inside the kernel
    (lax.dot_general, contracting dim 0 of both operands) instead of
    pre-transposing to (B, C0, N) in XLA — at the RCNN SA0 reference
    geometry (1600 ROIs) that transpose is a 210 MB HBM round-trip
    (~1.3 ms of the profile's copy ops). Default stays the XLA transpose
    until the on-chip A/B flips it."""
    return os.environ.get("DISPRCNN_SA_VT", "xla") == "fold"


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


def _vsep() -> bool:
    """xfold with SEPARATE vT/xyz3T kernel inputs concatenated in VMEM per
    grid step instead of one XLA-side (B, C0+9, N) concat — the concat is
    a full HBM round-trip of the 210 MB vT at the RCNN SA0 reference
    geometry (profile_rcnn_trace r5i: biggest glue fusion 1.78 ms).
    Bit-identical: the kernel sees the same (C0+9, N) operand either way.
    Default ON since the r5j on-chip A/B (2026-08-20): SA0 21.44 -> 20.96
    ms at the reference geometry, SA1 neutral (4.44 -> 4.43)."""
    return os.environ.get("DISPRCNN_SA_VSEP", "1") == "1"


def _m_tile_env():
    """Center-tile size override (DISPRCNN_SA_MT). The default runs ONE
    mt=128 tile per grid step at the RCNN SA0 geometry — the (n, s*mt)
    one-hot build then has no other tile's selection dot to overlap with
    inside the step. Splitting into 2-4 tiles exposes independent
    build->dot chains the Mosaic scheduler can interleave. 0 = keep the
    per-kernel default."""
    v = int(os.environ.get("DISPRCNN_SA_MT", "0"))
    return v if v > 0 else None


def _rows() -> int:
    """Batch R batch-rows (ROIs) per grid step — same math, R x fewer grid
    steps. 0 = auto (default): 2 rows on big-batch kernels (b >= 256,
    i.e. the RCNN per-proposal stage), 1 elsewhere — the r5f on-chip A/B
    (2026-08-20): rows2 won the RCNN standalone at the reference budget
    (34.32 -> 33.99 ms; kernel-level SA0 21.75 -> 21.44, SA1 4.82 ->
    4.55) but REGRESSED rpn3d (4.26 -> 5.30, b=16 there), and r4e showed
    rows4 loses everywhere (VMEM pressure)."""
    return int(os.environ.get("DISPRCNN_SA_ROWS", "0"))


def _kernel_t(s, r2, mt, nlayers, fold_v, use_cumsum, rows, interpret,
              xfold, vsep, *refs):
    """Transposed reformulation of _kernel — bit-identical outputs, ~3x less
    MXU-equivalent work at the RCNN SA0 geometry (B256 N512 M128 S64 C128):

    - ranks via a bf16 0/1 tri-matmul with f32 MXU accumulation (exact
      integer counts; the f32 dot's 4x throughput penalty was never needed
      for 0/1 INPUTS — only count OUTPUTS exceed bf16's 256 integer range,
      and those live in the f32 accumulator);
    - the xyz gather as a bf16 one-hot dot against an exact hi/mid/lo
      3-split of f32 coordinates (each 8-mantissa-bit slice is exactly
      representable; one-hot selection sums exactly one term, so
      (hi+mid)+lo reconstructs the f32 value bit-exactly) — the old form
      was an f32 dot whose 3 output lanes padded to 128;
    - everything (C, lanes)-transposed with slot-major merged lanes
      (col = slot*mt + i), so the one-hot is ONE bf16 compare (ranks
      clamped to s<=256 are bf16-exact) and the max-over-S is a log tree
      of lane-aligned slices. Inputs arrive pre-transposed from XLA.
    """
    if xfold and vsep:
        # separate inputs, concatenated in VMEM per row (see _vsep)
        xyz, ctrT, vT, xyz3T, w0xT, mul0, add0 = refs[:7]
        wb = refs[7 : 7 + 2 * nlayers]
        out = refs[7 + 2 * nlayers]
    elif xfold:  # xyz3T rows ride inside vT: (rows, C0+9, N)
        xyz, ctrT, vT, w0xT, mul0, add0 = refs[:6]
        xyz3T = None
        wb = refs[6 : 6 + 2 * nlayers]
        out = refs[6 + 2 * nlayers]
    else:
        xyz, ctrT, vT, xyz3T, w0xT, mul0, add0 = refs[:7]
        wb = refs[7 : 7 + 2 * nlayers]
        out = refs[7 + 2 * nlayers]

    def dotf(a, b, dims=None):
        """bf16 x bf16 -> f32 dot. In interpret mode XLA:CPU's DotThunk
        lacks BF16xBF16=F32 for some (sliced-operand, odd-shape) combos —
        up-cast there: bf16->f32 is exact and products of bf16 values are
        exact in f32, so the result is bit-identical."""
        if interpret:
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        if dims is None:
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32)
    n = xyz.shape[1]
    m = ctrT.shape[2]
    c0 = vT.shape[1] - (9 if (xfold and not vsep) else 0)
    sf = float(s)

    if not use_cumsum:
        # inclusive lower-tri, bf16 0/1: triT[k, j] = (j <= k)
        triT = (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ).astype(jnp.bfloat16)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    # slot id per merged lane (slot-major): col j -> j // mt
    # (f32: Mosaic lacks bf16 ordered-< under packed layouts)
    slots = (
        jax.lax.broadcasted_iota(jnp.int32, (1, s * mt), 1) // mt
    ).astype(jnp.float32)  # values < s <= 256

    for rr, t0 in [(r_, t_) for r_ in range(rows)
                   for t_ in range(0, m, mt)]:
        xyzc = xyz[rr].astype(jnp.float32)  # (N, 3) f32 column access
        if xfold and vsep:
            # sublane concat at offset c0 (8-aligned) — a few KB of VPU
            # copies per row instead of the XLA-side HBM concat
            vv = jnp.concatenate([vT[rr], xyz3T[rr]], axis=0)  # (C0+9, N)
            x3 = None
        else:
            vv = vT[rr]  # (C0[+9], N) bf16 — or (N, C0) when folded
            x3 = None if xfold else xyz3T[rr]  # (9, N) bf16 hi/mid/lo
        cT = ctrT[rr][:, t0 : t0 + mt].astype(jnp.float32)  # (3, mt)
        d2 = jnp.zeros((n, mt), jnp.float32)
        for k in range(3):
            diff = xyzc[:, k : k + 1] - cT[k : k + 1, :]
            d2 = d2 + diff * diff
        mask = d2 < r2  # strict, as the CUDA kernel (f32 compare -> i1:
        # Mosaic's bf16 cmpf support is layout-dependent, keep compares f32)
        maskf = mask.astype(jnp.float32)
        if use_cumsum:
            # inclusive prefix count over the sublane (N) axis — exact:
            # counts are small integers, f32 addition order-independent.
            # jnp.cumsum has no Pallas-TPU lowering (NotImplementedError on
            # Mosaic, found by tools/kernel_smoke.py); spell it as the
            # Hillis-Steele log-shift scan: log2(N) shifted VPU adds.
            incl = maskf
            sh = 1
            while sh < n:
                incl = incl + jnp.concatenate(
                    [jnp.zeros((sh, mt), jnp.float32), incl[: n - sh]],
                    axis=0,
                )
                sh *= 2
        else:
            maskb = maskf.astype(jnp.bfloat16)
            incl = dotf(triT, maskb)
        cnt = incl[n - 1 : n, :]  # (1, mt) f32 exact counts
        rank = incl - maskf  # exclusive prefix count
        # -1 outside the ball (never matches a target slot >= 0); empty
        # ball -> point 0 gets rank 0 so every slot selects it
        rank = jnp.where(mask, rank, -1.0)
        rank = jnp.where((iota_n == 0) & (cnt == 0.0), 0.0, rank)
        # clamp to s: ranks >= s never match (targets < s), and <= s is
        # bf16-exact for s <= 256
        rankc = jnp.minimum(rank, sf).astype(jnp.bfloat16)  # (n, mt)
        cntc = jnp.minimum(cnt, sf)  # (1, mt) f32

        rank_rep = jnp.concatenate([rankc] * s, axis=1)  # (n, s*mt)
        cnt_rep = jnp.concatenate([cntc] * s, axis=1)  # (1, s*mt)
        tgt = jnp.where(slots < cnt_rep, slots, 0.0).astype(jnp.bfloat16)
        # one-hot WITHOUT a bf16 compare: ranks/targets are integer-valued,
        # so 1 - |rank - tgt| is exactly 1 at equality and <= 0 otherwise
        oh = jnp.maximum(
            jnp.bfloat16(1.0) - jnp.abs(rank_rep - tgt), jnp.bfloat16(0.0)
        )  # (n, s*mt) 0/1 bf16

        # gathers as bf16 MXU dots with f32 accumulation: one-hot rows sum
        # exactly one term -> exact selection, any contraction order
        if xfold:
            # one (C0+9, N) x (N, L) dot: the xyz hi/mid/lo rows ride in
            # the feature operand (a standalone 9-row dot costs a full
            # MXU output row-tile); rows of a dot are independent, so
            # gf/g3 are bit-identical to the two-dot form
            gfx = dotf(vv, oh)  # (C0+9, L)
            gf = gfx[:c0]
            g3 = gfx[c0:]
        elif fold_v:
            # vv is (N, C0): contract over N without the XLA-side HBM
            # transpose (the MXU streams either operand orientation)
            gf = dotf(vv, oh, (((0,), (0,)), ((), ())))  # (C0, L)
            g3 = dotf(x3, oh)  # (9, L)
        else:
            gf = dotf(vv, oh)  # (C0, L)
            g3 = dotf(x3, oh)  # (9, L)
        gx = (g3[0:3] + g3[3:6]) + g3[6:9]  # exact f32 xyz (3-split)
        cx = jnp.concatenate([cT] * s, axis=1)  # (3, s*mt)
        ctd = (gx - cx).astype(jnp.bfloat16)  # f32 centering, then bf16
        # mlp0's xyz columns unrolled on the VPU in bf16; sum the 3 terms
        # FIRST ((t0+t1)+t2), then add to the gather — matches _SlicedDense
        pos = None
        for k in range(3):
            t = w0xT[:, k : k + 1].astype(jnp.bfloat16) * ctd[k : k + 1, :]
            pos = t if pos is None else pos + t
        x = gf.astype(jnp.bfloat16) + pos
        x = jnp.maximum(
            x.astype(jnp.float32) * mul0[...] + add0[...], 0.0
        ).astype(jnp.bfloat16)
        for i in range(nlayers):
            wgt, b = wb[2 * i], wb[2 * i + 1]
            y = dotf(wgt[...], x)
            x = jnp.maximum(y + b[...], 0.0).astype(jnp.bfloat16)
        # max over slots: log tree of lane-aligned halves (slot-major)
        width = s
        while width > 1:
            half = width // 2
            x = jnp.maximum(x[:, : half * mt], x[:, half * mt : width * mt])
            width = half
        out[rr, :, t0 : t0 + mt] = x.astype(out.dtype)


def _sa_ball_mlp_max_t(xyz, centers, v, w0x, mul0, add0, weights,
                       radius, s, m_tile, interpret,
                       ranks_cumsum=False, fold_v=False, rows=1,
                       xfold=False, vsep=False):
    b, n, _ = xyz.shape
    m = centers.shape[1]
    c0 = v.shape[-1]
    nlayers = len(weights)
    c_last = weights[-1][0].shape[-1]
    mt = min(m_tile, m)
    while m % mt:
        mt -= 1
    rows = min(rows, b)
    while b % rows:
        rows -= 1

    xt = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)  # (B, 3, N)
    hi = xt.astype(jnp.bfloat16)
    r1 = xt - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    xyz3T = jnp.concatenate([hi, mid, lo], axis=1)  # (B, 9, N)

    assert not (xfold and fold_v), "xfold needs the (C, N) transposed v"
    if xfold and vsep:
        # separate inputs; the kernel concatenates in VMEM (see _vsep)
        vT = jnp.swapaxes(v.astype(jnp.bfloat16), 1, 2)
        v_spec = pl.BlockSpec((rows, c0, n), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    elif xfold:
        # xyz3T rides inside the feature operand: ONE (C0+9, N) selection
        # dot in the kernel instead of a full-row-tile 9-row second dot
        vT = jnp.concatenate(
            [jnp.swapaxes(v.astype(jnp.bfloat16), 1, 2), xyz3T], axis=1)
        v_spec = pl.BlockSpec((rows, c0 + 9, n), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        vT = (v.astype(jnp.bfloat16) if fold_v
              else jnp.swapaxes(v.astype(jnp.bfloat16), 1, 2))
        v_spec = (
            pl.BlockSpec((rows, n, c0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            if fold_v else
            pl.BlockSpec((rows, c0, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    in_specs = [
        pl.BlockSpec((rows, n, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 3, m), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        v_spec,
    ]
    args = [xyz, jnp.swapaxes(centers, 1, 2), vT]
    if (not xfold) or vsep:
        in_specs.append(pl.BlockSpec((rows, 9, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(xyz3T)
    in_specs += [
        pl.BlockSpec((c0, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c0, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c0, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [
        jnp.swapaxes(w0x, 0, 1),
        mul0.reshape(c0, 1).astype(jnp.float32),
        add0.reshape(c0, 1).astype(jnp.float32),
    ]
    for wgt, bias in weights:
        ci, co = wgt.shape
        in_specs.append(pl.BlockSpec((co, ci), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((co, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.swapaxes(wgt.astype(jnp.bfloat16), 0, 1))
        args.append(bias.reshape(co, 1).astype(jnp.float32))

    outT = pl.pallas_call(
        partial(_kernel_t, s, float(radius) * float(radius), mt, nlayers,
                fold_v, ranks_cumsum, rows, interpret, xfold, vsep),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, c_last, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_last, m), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return jnp.swapaxes(outT, 1, 2)


def _use_gather() -> str:
    """Modes: "1"/"onehot" — keep the one-hot build, route only the big
    feature-selection dot through dynamic_gather; "bisect" — drop the
    one-hot entirely, indices from a binary search on the prefix count
    (see _kernel_b); "lanes" — the r5 lane-chunked gather kernel
    (_kernel_l): indices from a lane-axis binary search on the prefix
    count, features via <=128-lane chunked `tpu.dynamic_gather`s along
    the LANE axis (the r4 on-chip failures were SUBLANE gathers, whose
    one-vreg table limit is 8 rows f32; the lane-axis limit is 128).
    Returns the raw mode string ("" = one-hot MXU dot, the default) —
    returning a bool here silently routed every named mode to the
    default kernel while the A/B harness reported it as the variant
    (ADVICE r4, fixed)."""
    m = os.environ.get("DISPRCNN_SA_GATHER", "")
    if m in ("0", ""):
        return ""
    if m == "1":
        return "onehot"
    if m not in ("onehot", "bisect", "lanes"):
        raise ValueError(f"DISPRCNN_SA_GATHER={m!r}: "
                         "expected one of '', '0', '1', 'onehot', "
                         "'bisect', 'lanes'")
    return m


def _kernel_g(s, r2, mt, nlayers, rows, *refs):
    """Row-major SA kernel with the feature gather as chunked
    `tpu.dynamic_gather`s (see _use_gather). Layouts are all natural
    (B, N/M, C) — no XLA-side transposes on v, centers, or the output.
    Bit-identical to _kernel/_kernel_t: the gather selects exactly the
    rows the one-hot dot selected; every later bf16 association is copied
    from _kernel."""
    xyz, ctr, v, w0x, mul0, add0 = refs[:6]
    wb = refs[6 : 6 + 2 * nlayers]
    out = refs[6 + 2 * nlayers]
    n = xyz.shape[1]
    m = ctr.shape[1]
    c0 = v.shape[-1]
    ls = mt * s  # lanes... rows per tile after slot expansion
    assert ls % n == 0, (ls, n)

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ).astype(jnp.float32)  # inclusive lower-tri: tri[k, n] = k <= n
    iota_nf = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(
        jnp.float32)

    for rr in range(rows):
        xyzv = xyz[rr].astype(jnp.float32)  # (N, 3)
        # f32 gather width: see _kernel_b (Mosaic bitwidth-match rule)
        vv = v[rr].astype(jnp.float32)  # (N, C0)
        # (xyz | point-index) — one f32 dot extracts both the gathered
        # coordinates and the selected index per (center, slot) row
        xyzi = jnp.concatenate([xyzv, iota_nf], axis=1)  # (N, 4)
        pooled = []
        for t0 in range(0, m, mt):
            c = ctr[rr, t0 : t0 + mt].astype(jnp.float32)  # (mt, 3)
            d2 = jnp.zeros((mt, n), jnp.float32)
            for k in range(3):
                diff = c[:, k : k + 1] - xyzv[:, k].reshape(1, n)
                d2 = d2 + diff * diff
            mask = (d2 < r2).astype(jnp.float32)  # strict, as CUDA
            incl = jnp.dot(mask, tri, preferred_element_type=jnp.float32)
            rank = incl - mask  # exclusive prefix count, int-valued f32
            cnt = incl[:, n - 1 : n]  # (mt, 1)
            slots = jax.lax.broadcasted_iota(
                jnp.int32, (mt, s), 1).astype(jnp.float32)
            tgt = jnp.where(slots < cnt, slots, 0.0)  # (mt, s)
            onehot = (
                (rank[:, None, :] == tgt[:, :, None]) * mask[:, None, :]
            )  # (mt, s, n) f32 0/1
            empty = (cnt[:, :, None] == 0.0).astype(jnp.float32)
            e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2) == 0)
            onehot = onehot * (1.0 - empty) + empty * e0.astype(jnp.float32)
            ohf = onehot.reshape(ls, n)  # f32 0/1, (m-major, slot) rows
            gxi = jnp.dot(ohf, xyzi, preferred_element_type=jnp.float32)
            gx = gxi[:, :3]  # (ls, 3) exact f32 xyz
            idx = gxi[:, 3:4].astype(jnp.int32)  # exact: values < n <= 2^24
            # the big gather: ls rows of C0 channels in ls/n chunks whose
            # dst shape equals the (N, C0) source — Mosaic's supported
            # dynamic_gather form (per-lane indices, here uniform per row)
            parts = []
            for cstart in range(0, ls, n):
                idxc = jnp.broadcast_to(
                    idx[cstart : cstart + n], (n, c0))
                parts.append(jnp.take_along_axis(vv, idxc, axis=0))
            gf = jnp.concatenate(parts, axis=0)  # f32, exact bf16 values
            # identical bf16 association to _kernel from here down
            cx = jnp.repeat(c, s, axis=0)  # (ls, 3)
            ctd = (gx - cx).astype(jnp.bfloat16)
            pos = None
            for k in range(3):
                t = ctd[:, k : k + 1] * w0x[k].reshape(1, c0).astype(
                    jnp.bfloat16)
                pos = t if pos is None else pos + t
            x = gf.astype(jnp.bfloat16) + pos
            x = jnp.maximum(
                x.astype(jnp.float32) * mul0[0] + add0[0], 0.0
            ).astype(jnp.bfloat16)
            for i in range(nlayers):
                wgt, bi = wb[2 * i], wb[2 * i + 1]
                y = jnp.dot(x, wgt[...], preferred_element_type=jnp.float32)
                x = jnp.maximum(y + bi[0], 0.0).astype(jnp.bfloat16)
            pooled.append(jnp.max(x.reshape(mt, s, -1), axis=1))
        out[rr] = jnp.concatenate(pooled, axis=0).astype(out.dtype)


def _kernel_b(s, r2, mt, nlayers, rows, interpret, *refs):
    """One-hot-FREE SA kernel: the slot-th in-ball point index comes from a
    BINARY SEARCH on the inclusive prefix count (incl[:, m] is monotone in
    the point index; the first j with incl[j] == q+1 is exactly the rank-q
    ball point), probed with Mosaic's dynamic_gather. The (N, S*MT) one-hot
    build — ~20M VPU elem-ops per ROI at the RCNN SA0 geometry, the
    measured bottleneck once the selection dot is gone — becomes
    ceil(log2 N) gather+compare+add steps on (N, MT) tiles (~2M elem-ops).
    Bit-identical: exact integer counts, exact index selection, and the
    same bf16 association as _kernel downstream. Empty ball -> point 0
    (incl never reaches 1, fallback 0); partial ball -> first neighbour
    repeated (slots >= cnt fall back to the rank-0 point)."""
    xyz, ctr, ctrT, v, w0x, mul0, add0 = refs[:7]
    wb = refs[7 : 7 + 2 * nlayers]
    out = refs[7 + 2 * nlayers]

    def dotf(a, b):
        # interpret mode: XLA:CPU's DotThunk lacks BF16xBF16=F32 for some
        # odd-shape combos; the up-cast is bit-identical (see _kernel_t)
        if interpret:
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    n = xyz.shape[1]
    m = ctr.shape[1]  # row-major centers; ctrT is the (rows, 3, M) twin
    c0 = v.shape[-1]
    ls = mt * s
    assert ls % n == 0 and s <= n, (ls, n, s)
    kmax = 1
    while kmax < n:
        kmax *= 2

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    tq = (iota_q + 1).astype(jnp.float32)  # target count per slot row

    for rr in range(rows):
        xyzc = xyz[rr].astype(jnp.float32)  # (N, 3)
        # gather at f32 width: Mosaic's dynamic_gather requires index and
        # result bitwidths to match (i32 idx + bf16 result rejected on-chip,
        # r4f queue); bf16->f32 is exact and the round-trip is bit-identical
        vv = v[rr].astype(jnp.float32)  # (N, C0)
        xyzi = xyzc  # (N, 3) f32 — gathered directly (no one-hot dot)
        for t0 in range(0, m, mt):
            cT = ctrT[rr][:, t0 : t0 + mt].astype(jnp.float32)  # (3, mt)
            c = ctr[rr, t0 : t0 + mt].astype(jnp.float32)  # (mt, 3)
            d2 = jnp.zeros((n, mt), jnp.float32)
            for k in range(3):
                diff = xyzc[:, k : k + 1] - cT[k : k + 1, :]
                d2 = d2 + diff * diff
            mask = d2 < r2  # strict, as the CUDA kernel
            maskb = mask.astype(jnp.bfloat16)
            # inclusive prefix count on the MXU (bf16 0/1 inputs, exact
            # f32 accumulation), as _kernel_t
            triT = (
                jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
                <= jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            ).astype(jnp.bfloat16)
            incl = dotf(triT, maskb)  # (n, mt)
            cnt = incl[n - 1 : n, :]  # (1, mt) exact counts

            # lower_bound(incl[:, m], q+1) via power-of-two jumps; row q
            # holds the rank-q ball point index (only rows < s are used)
            pos = jnp.zeros((n, mt), jnp.int32)
            k = kmax
            while k >= 1:
                cand = jnp.minimum(pos + (k - 1), n - 1)
                val = jnp.take_along_axis(incl, cand, axis=0)
                step_ok = (pos + k <= n) & (val < tq)
                pos = jnp.where(step_ok, pos + k, pos)
                k //= 2
            valid_q = tq <= cnt  # slot q exists iff q+1 <= cnt
            pos0 = pos[0:1, :]  # rank-0 ball point (partial-ball fill)
            posf = jnp.where(valid_q, pos,
                             jnp.where(cnt > 0.0, pos0, 0))
            posf = jnp.minimum(posf, n - 1)

            # rows (q*mt + m): lanes->sublanes flatten of the (s, mt) tile
            idx_col = posf[:s].reshape(ls, 1)
            parts_v, parts_x = [], []
            for cstart in range(0, ls, n):
                idxc = idx_col[cstart : cstart + n]
                parts_v.append(jnp.take_along_axis(
                    vv, jnp.broadcast_to(idxc, (n, c0)), axis=0))
                parts_x.append(jnp.take_along_axis(
                    xyzi, jnp.broadcast_to(idxc, (n, 3)), axis=0))
            gf = jnp.concatenate(parts_v, axis=0).astype(
                jnp.bfloat16)  # (ls, C0) exact round-trip
            gx = jnp.concatenate(parts_x, axis=0)  # (ls, 3) f32 exact
            # identical bf16 association to _kernel from here down
            cx = jnp.concatenate([c] * s, axis=0)  # (ls, 3) slot-major
            ctd = (gx - cx).astype(jnp.bfloat16)
            pos_t = None
            for k in range(3):
                t = ctd[:, k : k + 1] * w0x[k].reshape(1, c0).astype(
                    jnp.bfloat16)
                pos_t = t if pos_t is None else pos_t + t
            x = gf + pos_t  # gf already exact bf16 rows of v
            x = jnp.maximum(
                x.astype(jnp.float32) * mul0[0] + add0[0], 0.0
            ).astype(jnp.bfloat16)
            for i in range(nlayers):
                wgt, bi = wb[2 * i], wb[2 * i + 1]
                y = dotf(x, wgt[...])
                x = jnp.maximum(y + bi[0], 0.0).astype(jnp.bfloat16)
            pooled = jnp.max(x.reshape(s, mt, -1), axis=0)  # (mt, c_last)
            out[rr, t0 : t0 + mt, :] = pooled.astype(out.dtype)


def _sa_ball_mlp_max_b(xyz, centers, v, w0x, mul0, add0, weights,
                       radius, s, m_tile, interpret, rows=1):
    b, n, _ = xyz.shape
    m = centers.shape[1]
    c0 = v.shape[-1]
    nlayers = len(weights)
    c_last = weights[-1][0].shape[-1]
    mt = min(m_tile, m)
    while mt > 0 and (m % mt or (mt * s) % n):
        mt -= 1
    assert mt >= 1, (m, s, n)
    rows = min(rows, b)
    while b % rows:
        rows -= 1

    in_specs = [
        pl.BlockSpec((rows, n, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, m, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 3, m), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, n, c0), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c0), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [
        xyz, centers, jnp.swapaxes(centers, 1, 2), v.astype(jnp.bfloat16),
        w0x,
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
        partial(_kernel_b, s, float(radius) * float(radius), mt, nlayers,
                rows, interpret),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, m, c_last), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c_last), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def _lanes_search() -> str:
    """Slot-index extraction mode for the lanes kernel: "sum" (default) =
    one masked compare+reduce per slot (s passes over the (n, mt) prefix
    counts, ~8.2K vreg-ops/ROI at SA0); "bisect" = ceil(log2 n)-step
    binary search on the LANE-oriented prefix counts via the same chunked
    dynamic_gather (~2.3K vreg-ops incl. the 128-slot pad) plus s
    (mt,1)->(1,mt) vector reshapes. Bit-identical; A/B on-chip."""
    m = os.environ.get("DISPRCNN_SA_LSEARCH", "sum")
    if m not in ("sum", "bisect"):
        raise ValueError(f"DISPRCNN_SA_LSEARCH={m!r}")
    return m


def _lanes_gather16() -> bool:
    """Gather the FEATURE table in bf16 with i16 indices instead of f32
    with i32 (Mosaic's bitwidth-match rule allows either pairing): a
    (C0, 128) bf16 table spans half the vregs of its f32 upcast, halving
    the per-slot gather instruction count. Exact either way — the gather
    selects stored bf16 values. xyz stays f32+i32 (geometry precision).
    Default off until the on-chip A/B flips it."""
    return os.environ.get("DISPRCNN_SA_LG16", "0") == "1"


def _kernel_l(s, r2, mt, nlayers, rows, p, cw, interpret, g16, search,
              *refs):
    """Lane-chunked hardware-gather SA kernel (r5). Replaces the one-hot
    selection dot — 1.07 of SA0's 1.9 GFLOP/ROI at the RCNN reference
    geometry (VERDICT r4) — with `tpu.dynamic_gather`s along the LANE
    axis, where Mosaic's one-vreg table limit is 128 entries (the r4
    on-chip rejections were SUBLANE gathers, whose limit is 8 rows f32;
    512-entry tables are chunked 4x128 with a masked combine, exactly the
    chunked form VERDICT r4 prescribed).

    Structure per (row, center-tile):
    - d2/mask/inclusive-prefix-count exactly as _kernel_t's cumsum path
      ((n, mt) layout, Hillis-Steele over sublanes);
    - slot q's source index WITHOUT a one-hot: lower_bound(incl, q+1)
      == #{j: incl[j] <= q}, one masked sublane reduction per slot
      (s compare+sum passes replace the (n, s*mt) one-hot build);
    - slots processed in packs of p = 128//mt so every gather runs at
      exactly (sublanes, 128) == table-chunk shape (Mosaic's same-shape
      dynamic_gather form); tail packs repeat slot s-1 (duplicates are
      absorbed by the max);
    - features gathered from the f32 upcast of v (bf16 -> f32 exact,
      selection exact either way: bit-identical to the one-hot dot);
      xyz gathered from the f32 table directly (the hi/mid/lo 3-split of
      _kernel_t exists only because one-hot DOTS sum bf16 terms — a
      hardware gather selects the f32 value itself);
    - per-pack mlp chain on (C, 128) tiles, max over the pack's slots by
      a lane-sliced log tree, running max across packs.
    Every bf16 association downstream of the gather is copied from
    _kernel_t, so outputs are bit-identical to the shipped kernel."""
    xyz, ctrT, ctrN, vT, xyzT, w0xT, mul0, add0 = refs[:8]
    wb = refs[8 : 8 + 2 * nlayers]
    out = refs[8 + 2 * nlayers]

    def dotf(a, b):
        # interpret mode: XLA:CPU's DotThunk lacks BF16xBF16=F32 for some
        # odd-shape combos; the up-cast is bit-identical (see _kernel_t)
        if interpret:
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    n = xyz.shape[1]
    m = ctrT.shape[2]
    c0 = vT.shape[1]
    nch = -(-n // cw)
    npad = nch * cw - n

    vdt = jnp.bfloat16 if g16 else jnp.float32
    idt = jnp.int16 if g16 else jnp.int32
    for rr in range(rows):
        xyzc = xyz[rr].astype(jnp.float32)  # (n, 3) column access for d2
        vvf = vT[rr].astype(vdt)  # (c0, n) gather table (see _lanes_gather16)
        xtb = xyzT[rr].astype(jnp.float32)  # (3, n) f32 gather table
        if npad:
            vvf = jnp.concatenate(
                [vvf, jnp.zeros((c0, npad), vdt)], axis=1)
            xtb = jnp.concatenate(
                [xtb, jnp.zeros((3, npad), jnp.float32)], axis=1)
        for t0 in range(0, m, mt):
            cT = ctrT[rr][:, t0 : t0 + mt].astype(jnp.float32)  # (3, mt)
            if search == "bisect":
                # (mt, n) orientation: d2/cumsum over LANES, then a
                # lower_bound binary search probed with the same chunked
                # lane-gather as the feature phase (see _lanes_search)
                cN = ctrN[rr, t0 : t0 + mt].astype(jnp.float32)  # (mt, 3)
                xtb0 = xtb[:, : n] if npad else xtb  # (3, n) unpadded
                d2 = jnp.zeros((mt, n), jnp.float32)
                for k in range(3):
                    diff = cN[:, k : k + 1] - xtb0[k : k + 1, :]
                    d2 = d2 + diff * diff
                maskf = (d2 < r2).astype(jnp.float32)  # (mt, n)
                incl = maskf
                sh = 1
                while sh < n:
                    incl = incl + jnp.concatenate(
                        [jnp.zeros((mt, sh), jnp.float32),
                         incl[:, : n - sh]], axis=1)
                    sh *= 2
                cnt_col = incl[:, n - 1 : n]  # (mt, 1)
                if npad:
                    incl = jnp.concatenate(
                        [incl, jnp.zeros((mt, npad), jnp.float32)], axis=1)
                sp_ = cw  # slots padded to one gather-tile of lanes
                tq = (jax.lax.broadcasted_iota(jnp.int32, (1, sp_), 1)
                      + 1).astype(jnp.float32)
                pos = jnp.zeros((mt, sp_), jnp.int32)
                kk = 1
                while kk < n:
                    kk *= 2
                while kk >= 1:
                    cand = jnp.minimum(pos + (kk - 1), n - 1)
                    val = jnp.zeros((mt, sp_), jnp.float32)
                    for ci in range(nch):
                        rel = cand - ci * cw
                        inb = (rel >= 0) & (rel < cw)
                        relc = jnp.clip(rel, 0, cw - 1)
                        g = jnp.take_along_axis(
                            incl[:, ci * cw : (ci + 1) * cw], relc, axis=1)
                        val = jnp.where(inb, g, val)
                    step_ok = (pos + kk <= n) & (val < tq)
                    pos = jnp.where(step_ok, pos + kk, pos)
                    kk //= 2
                valid_q = tq <= cnt_col  # (mt, sp_)
                posf = jnp.where(valid_q, pos,
                                 jnp.where(cnt_col > 0.0, pos[:, 0:1], 0))
                posf = jnp.minimum(posf, n - 1)
                posr = [posf[:, q : q + 1].reshape(1, mt)
                        for q in range(s)]
            else:
                d2 = jnp.zeros((n, mt), jnp.float32)
                for k in range(3):
                    diff = xyzc[:, k : k + 1] - cT[k : k + 1, :]
                    d2 = d2 + diff * diff
                mask = d2 < r2  # strict, as the CUDA kernel
                maskf = mask.astype(jnp.float32)
                # inclusive prefix count: Hillis-Steele log-shift scan over
                # the sublane (N) axis — exact small-integer f32 counts
                incl = maskf
                sh = 1
                while sh < n:
                    incl = incl + jnp.concatenate(
                        [jnp.zeros((sh, mt), jnp.float32), incl[: n - sh]],
                        axis=0,
                    )
                    sh *= 2
                cnt = incl[n - 1 : n, :]  # (1, mt) exact counts
                # slot q's source = lower_bound(incl, q+1) =
                # #{j: incl[j] <= q} (incl steps by 0/1, so the first j
                # with incl[j] == q+1 is the rank-q ball point — same row
                # the one-hot selected); partial ball -> rank-0 point,
                # empty ball -> point 0
                pos0 = None
                posr = []
                for q in range(s):
                    pq = jnp.sum(
                        (incl <= jnp.float32(q)).astype(jnp.float32),
                        axis=0, keepdims=True)  # (1, mt)
                    if q == 0:
                        pos0 = pq
                    pf = jnp.where(jnp.float32(q) < cnt, pq,
                                   jnp.where(cnt > 0.0, pos0, 0.0))
                    posr.append(
                        jnp.minimum(pf, jnp.float32(n - 1))
                        .astype(jnp.int32))
            acc = None
            for q0 in range(0, s, p):
                qs = [min(q0 + j, s - 1) for j in range(p)]
                idxp = (posr[qs[0]] if p == 1 else jnp.concatenate(
                    [posr[q] for q in qs], axis=1))  # (1, p*mt=128) i32
                cx = (cT if p == 1
                      else jnp.concatenate([cT] * p, axis=1))  # (3, 128)
                gf = gx = None
                for ci in range(nch):
                    rel = idxp - ci * cw
                    inb = (rel >= 0) & (rel < cw)
                    relc = jnp.clip(rel, 0, cw - 1)
                    gfc = jnp.take_along_axis(
                        vvf[:, ci * cw : (ci + 1) * cw],
                        jnp.broadcast_to(relc.astype(idt), (c0, cw)), axis=1)
                    gxc = jnp.take_along_axis(
                        xtb[:, ci * cw : (ci + 1) * cw],
                        jnp.broadcast_to(relc, (3, cw)), axis=1)
                    gf = gfc if gf is None else jnp.where(inb, gfc, gf)
                    gx = gxc if gx is None else jnp.where(inb, gxc, gx)
                # identical bf16 association to _kernel_t from here down
                ctd = (gx - cx).astype(jnp.bfloat16)
                pos_t = None
                for k in range(3):
                    t = (w0xT[:, k : k + 1].astype(jnp.bfloat16)
                         * ctd[k : k + 1, :])
                    pos_t = t if pos_t is None else pos_t + t
                x = gf.astype(jnp.bfloat16) + pos_t
                x = jnp.maximum(
                    x.astype(jnp.float32) * mul0[...] + add0[...], 0.0
                ).astype(jnp.bfloat16)
                for i in range(nlayers):
                    wgt, b = wb[2 * i], wb[2 * i + 1]
                    y = dotf(wgt[...], x)
                    x = jnp.maximum(y + b[...], 0.0).astype(jnp.bfloat16)
                # max over the pack's p slots: lane-sliced log tree
                width = p
                while width > 1:
                    half = width // 2
                    x = jnp.maximum(
                        x[:, : half * mt], x[:, half * mt : width * mt])
                    width = half
                acc = x if acc is None else jnp.maximum(acc, x)
            out[rr, :, t0 : t0 + mt] = acc.astype(out.dtype)


def _sa_ball_mlp_max_l(xyz, centers, v, w0x, mul0, add0, weights,
                       radius, s, m_tile, interpret, rows=1, g16=False,
                       search="sum"):
    b, n, _ = xyz.shape
    m = centers.shape[1]
    c0 = v.shape[-1]
    nlayers = len(weights)
    c_last = weights[-1][0].shape[-1]
    # mt must divide BOTH m (tiling) and 128 (slot packs of p = 128//mt
    # keep every gather at the (sublanes, 128) same-shape form)
    mt = min(m_tile or 128, m, 128)
    while mt > 0 and (m % mt or 128 % mt):
        mt -= 1
    assert mt >= 1, (m,)
    p = 128 // mt
    rows = min(rows, b)
    while b % rows:
        rows -= 1

    in_specs = [
        pl.BlockSpec((rows, n, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 3, m), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, m, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, c0, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 3, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c0, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c0, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c0, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [
        xyz,
        jnp.swapaxes(centers, 1, 2),
        centers,
        jnp.swapaxes(v.astype(jnp.bfloat16), 1, 2),
        jnp.swapaxes(xyz, 1, 2).astype(jnp.float32),
        jnp.swapaxes(w0x, 0, 1),
        mul0.reshape(c0, 1).astype(jnp.float32),
        add0.reshape(c0, 1).astype(jnp.float32),
    ]
    for wgt, bias in weights:
        ci, co = wgt.shape
        in_specs.append(pl.BlockSpec((co, ci), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((co, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.swapaxes(wgt.astype(jnp.bfloat16), 0, 1))
        args.append(bias.reshape(co, 1).astype(jnp.float32))

    outT = pl.pallas_call(
        partial(_kernel_l, s, float(radius) * float(radius), mt, nlayers,
                rows, p, 128, interpret, g16, search),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, c_last, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_last, m), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return jnp.swapaxes(outT, 1, 2)


def _sa_ball_mlp_max_g(xyz, centers, v, w0x, mul0, add0, weights,
                       radius, s, m_tile, interpret, rows=1):
    b, n, _ = xyz.shape
    m = centers.shape[1]
    c0 = v.shape[-1]
    nlayers = len(weights)
    c_last = weights[-1][0].shape[-1]
    mt = min(m_tile, m)
    while mt > 0 and (m % mt or (mt * s) % n):
        mt -= 1
    assert mt >= 1, (m, s, n)
    rows = min(rows, b)
    while b % rows:
        rows -= 1

    in_specs = [
        pl.BlockSpec((rows, n, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, m, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, n, c0), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
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
        partial(_kernel_g, s, float(radius) * float(radius), mt, nlayers,
                rows),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, m, c_last), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c_last), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def _sa_xla_oracle(xyz, centers, v, w0x, mul0, add0, weights, radius, s):
    """Differentiable XLA twin of the mega-kernel's math (the SharedMLP
    factored-path arithmetic: centered f32 gather, bf16 xyz term summed
    (t0+t1)+t2, affine+ReLU, mlp chain, max over S). Used as the
    custom_vjp BACKWARD of sa_ball_mlp_max_train — the kernel computes the
    identical function, so grads through this oracle are grads of the
    fused forward up to f32 accumulation order."""
    from ..points import ball_query, group_points

    dt = v.dtype
    idx = ball_query(centers, xyz, radius, s)  # (B, M, S) int — no grad
    gx = group_points(xyz, idx) - centers[:, :, None, :]  # f32 centered
    gf = group_points(v, idx)  # (B, M, S, C0)
    c0 = v.shape[-1]
    pos = None
    for k in range(3):
        t = gx[..., k : k + 1].astype(dt) * w0x[k].reshape(1, 1, 1, c0).astype(dt)
        pos = t if pos is None else pos + t
    x = gf.astype(dt) + pos
    x = jnp.maximum(
        x.astype(jnp.float32) * mul0.reshape(1, 1, 1, c0)
        + add0.reshape(1, 1, 1, c0), 0.0
    ).astype(dt)
    for wgt, b in weights:
        y = jnp.dot(x, wgt.astype(dt), preferred_element_type=jnp.float32)
        x = jnp.maximum(y + b.reshape(1, 1, 1, -1), 0.0).astype(dt)
    return jnp.max(x, axis=2)  # (B, M, C_last)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def sa_ball_mlp_max_train(xyz, centers, v, w0x, mul0, add0, weights,
                          radius, s, interpret=False):
    """Train-path fused SA: the eval mega-kernel as the FORWARD, the XLA
    factored path's VJP as the BACKWARD (the convtrain pattern, 837bc99 —
    VERDICT r4 ask #6: stage-3 training ran pure XLA). Only reachable when
    BN is off (RCNN stage: use_bn=False) — train-mode BN stats are over
    the grouped domain, which the fused kernel never materializes.
    Multi-chip note: the CPU dryrun never reaches this (TPU-gated); the
    kernel batches on the grid axis, which matches a data-sharded pjit."""
    return sa_ball_mlp_max(
        xyz, centers, v, w0x, mul0, add0, tuple(weights), radius, s,
        interpret=interpret,
    )


def _samt_fwd(xyz, centers, v, w0x, mul0, add0, weights, radius, s,
              interpret):
    out = sa_ball_mlp_max_train(
        xyz, centers, v, w0x, mul0, add0, weights, radius, s, interpret)
    return out, (xyz, centers, v, w0x, mul0, add0, weights)


def _samt_bwd(radius, s, interpret, res, ct):
    xyz, centers, v, w0x, mul0, add0, weights = res
    out, vjp = jax.vjp(
        lambda *a: _sa_xla_oracle(*a, radius, s),
        xyz, centers, v, w0x, mul0, add0, weights,
    )
    return vjp(ct.astype(out.dtype))


sa_ball_mlp_max_train.defvjp(_samt_fwd, _samt_bwd)


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
    m_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Env-dependent knobs (DISPRCNN_SA_T/_SA_RANKS/_SA_VT) are read HERE,
    outside the jit, and passed as static args — reading them inside the
    traced body would pin the first-seen config into the trace cache and
    silently ignore later env flips (the A/B tools flip them per config)."""
    if _m_tile_env() is not None:
        m_tile = _m_tile_env()
    if _fold_v_transpose() and _xfold():
        raise ValueError(
            "DISPRCNN_SA_VT=fold needs the (N, C0) v layout which "
            "DISPRCNN_SA_XFOLD=1 (now the default) replaces with the "
            "xyz-folded (C0+9, N) operand — set DISPRCNN_SA_XFOLD=0 to "
            "A/B fold_v (silently dropping it timed the wrong kernel, "
            "ADVICE r4)")
    return _sa_ball_mlp_max_jit(
        xyz, centers, v, w0x, mul0, add0, tuple(weights), radius, s,
        m_tile, interpret, _use_transposed(), _ranks_cumsum(),
        _fold_v_transpose(), _rows(), _use_gather(), _xfold(),
        _lanes_gather16(), _lanes_search(), _vsep(),
    )


@partial(jax.jit,
         static_argnames=("radius", "s", "m_tile", "interpret",
                          "transposed", "ranks_cumsum", "fold_v", "rows",
                          "gather", "xfold", "g16", "lsearch", "vsep"))
def _sa_ball_mlp_max_jit(
    xyz, centers, v, w0x, mul0, add0, weights,
    radius: float, s: int, m_tile, interpret: bool,
    transposed: bool, ranks_cumsum: bool, fold_v: bool, rows: int = 1,
    gather: str = "", xfold: bool = False, g16: bool = False,
    lsearch: str = "sum", vsep: bool = False,
) -> jnp.ndarray:
    if rows == 0:  # auto (see _rows): 2 on the big-batch RCNN stage
        rows = 2 if xyz.shape[0] >= 256 else 1
    if gather == "lanes":
        return _sa_ball_mlp_max_l(
            xyz, centers, v, w0x, mul0, add0, tuple(weights),
            radius, s, m_tile or 128, interpret, rows, g16, lsearch,
        )
    if gather:
        n = xyz.shape[1]
        m = centers.shape[1]
        mt = min(m_tile or 128, m)
        while mt > 0 and (m % mt or (mt * s) % n):
            mt -= 1
        if mt >= 1 and (gather != "bisect" or s <= n):
            fn = (_sa_ball_mlp_max_b if gather == "bisect"
                  else _sa_ball_mlp_max_g)
            return fn(
                xyz, centers, v, w0x, mul0, add0, tuple(weights),
                radius, s, mt, interpret, rows,
            )
        # geometry has no (mt*s) % n tiling — fall through
    if transposed:
        return _sa_ball_mlp_max_t(
            xyz, centers, v, w0x, mul0, add0, tuple(weights),
            radius, s, m_tile or 128, interpret, ranks_cumsum,
            fold_v and not xfold, rows, xfold, vsep,
        )
    b, n, _ = xyz.shape
    m = centers.shape[1]
    c0 = v.shape[-1]
    nlayers = len(weights)
    c_last = weights[-1][0].shape[-1]
    mt = min(m_tile or 32, m)
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
