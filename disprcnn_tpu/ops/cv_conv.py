"""Cost-volume first conv as 2D convs: a 24x true-FLOP reduction.

The PSMNet cost volume is STRUCTURED: slice d is [L*m_d | shift(R, d)*m_d]
(reference stackhourglass.py:117-128), so the first 3D conv (dres0_0)
collapses algebraically — conv2d of a column-shifted image is the shifted
conv2d away from the shift boundary, and conv2d of a column-masked image is
the plain conv2d away from the mask edge:

    out[d] = sum_kd conv2d(L * m_{d+kd-1}; KL[kd])
                  + conv2d(shift(R, d+kd-1) * m_{d+kd-1}; KR[kd])
           = M_d * PLsum  +  shift(PRsum, d)  +  (per-column corrections)

with PLsum = sum_kd conv2d(L; KL[kd]) and PRsum = sum_kd shift(conv2d(R;
KR[kd]), kd-1) computed ONCE for all D slices. The dense 3D conv costs
27*2C*Co FLOPs per voxel (and the TPU banded-packed form 2x that,
ops/conv3d_packed.py); this form costs 2 Co'=3Co conv2ds + 4 single-column
conv2ds + data movement — at the trunk geometry (D=24) that is ~24x fewer
true FLOPs, HBM-bound instead of MXU-bound.

The corrections are exact and enumerable (derivation in _band_column):
each live tap dd = d+kd-1 perturbs at most two columns per half near the
mask/shift boundary (x = dd-1, dd for the left half at dd>0; mirrored at
W+dd for dd<0) plus one image-edge column for the shifted right half. All
correction planes are single-column 1D convs over H, precomputed for every
column by four kw-sliced conv2ds (CL0/CL2/CR0/CR2).

Pure XLA and differentiable: serves the train path (where the fused Pallas
cost_volume_conv_bn kernel cannot run) as well as eval. Output layout and
values match conv3d_packed_r4(build_cost_volume_packed(...)) exactly (same
f32 accumulation dtype; elementwise sums reassociated).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv2d(x, w):
    """NHWC 3x3 (or 3x1) SAME conv, f32 accumulation."""
    kh, kw = w.shape[0], w.shape[1]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _shift_cols(x, d):
    """Zero-fill column shift: out[..., c, :] = x[..., c - d, :]."""
    if d == 0:
        return x
    w = x.shape[2]
    if d > 0:
        return jnp.pad(x[:, :, : w - d], ((0, 0), (0, 0), (d, 0), (0, 0)))
    return jnp.pad(x[:, :, -d:], ((0, 0), (0, 0), (0, -d), (0, 0)))


@partial(jax.jit, static_argnames=("mind4", "maxd4", "g"))
def cost_volume_conv_decomposed(
    lf: jnp.ndarray,  # (B, H, W, C) quarter-res left features
    rf: jnp.ndarray,  # (B, H, W, C) right features
    kernel: jnp.ndarray,  # raw (3, 3, 3, 2C, Co) dres0_0 conv kernel
    mind4: int,
    maxd4: int,
    g: int,
) -> jnp.ndarray:
    """-> RAW conv output, depth-packed rank-4 (B*Dg, H, W, G*Co) — the same
    layout/values as conv3d_packed_r4(build_cost_volume_packed(lf, rf, ...)).
    BN/ReLU are the caller's (train needs the raw output for batch stats)."""
    b, h, w, c = lf.shape
    co = kernel.shape[-1]
    d4 = maxd4 - mind4
    dg = d4 // g
    kl = kernel[:, :, :, :c, :]  # (kd, kh, kw, C, Co)
    kr = kernel[:, :, :, c:, :]

    def fold_kd(k):  # (kd, kh, kw, C, Co) -> (kh, kw, C, 3*Co), kd-major
        return k.transpose(1, 2, 3, 0, 4).reshape(3, 3, c, 3 * co)

    dt = lf.dtype
    pl = _conv2d(lf, fold_kd(kl).astype(dt)).reshape(b, h, w, 3, co)
    pr = _conv2d(rf, fold_kd(kr).astype(dt)).reshape(b, h, w, 3, co)

    def fold_col(k, kw_tap):  # single-kw-column 1D conv over H, all kd taps
        return k[:, :, kw_tap].transpose(1, 2, 0, 3).reshape(3, 1, c, 3 * co)

    # correction planes: cX{kw}[b, h, col, kt, co] = KX[kt][:, kw] (*)_h X[col]
    cl0 = _conv2d(lf, fold_col(kl, 0).astype(dt)).reshape(b, h, w, 3, co)
    cl2 = _conv2d(lf, fold_col(kl, 2).astype(dt)).reshape(b, h, w, 3, co)
    cr0 = _conv2d(rf, fold_col(kr, 0).astype(dt)).reshape(b, h, w, 3, co)
    cr2 = _conv2d(rf, fold_col(kr, 2).astype(dt)).reshape(b, h, w, 3, co)

    plsum = pl.sum(axis=3)
    prsum = sum(_shift_cols(pr[:, :, :, kt], kt - 1) for kt in range(3))

    cols = jnp.arange(w)

    def band_column(x, dd_live):
        """Exact output column x of slice d as sum over live taps (static
        python over the tap set; every term is a gathered (B, H, Co) plane).

        Left half, per live dd = d+kd-1 (kt the tap index):
          dd >= 0 mask m = [cols >= dd]:
            x >= dd+1 (or dd == 0): exact -> pl[x, kt]
            x == dd (dd >= 1): pl[x, kt] - cl0[dd-1, kt]  (kw=0 tap masked)
            x == dd-1:         cl2[dd, kt]                (only col dd alive)
            x <  dd-1:         0
          dd < 0 mask m = [cols < W+dd] (right-edge mirror):
            x <  W+dd-1: exact;  x == W+dd-1: pl - cl2[W+dd]
            x == W+dd: cl0[W+dd-1];  above: 0
        Right half (shift(R, dd) * m):
          dd > 0: x >= dd: shifted-exact -> pr[x-dd, kt], except the kw=2
                  tap at x == W-1 read SAME-pad 0 while pr[W-1-dd] read the
                  live R[W-dd]: subtract cr2[W-dd]. x == dd-1: cr2[0].
          dd < 0: x < W+dd: shifted-exact, except x == 0 whose kw=0 tap
                  read pad 0 vs R[-dd-1]: subtract cr0[-dd-1].
                  x == W+dd: cr0[W-1].  Above: 0.
          dd == 0: exact everywhere."""
        acc = None

        def add(v):
            nonlocal acc
            acc = v if acc is None else acc + v

        for kt, dd in dd_live:
            # ---- left half
            if dd == 0:
                add(pl[:, :, x, kt])
            elif dd > 0:
                if x >= dd + 1:
                    add(pl[:, :, x, kt])
                elif x == dd:
                    add(pl[:, :, x, kt] - cl0[:, :, dd - 1, kt])
                elif x == dd - 1:
                    add(cl2[:, :, dd, kt])
            else:  # dd < 0
                if x < w + dd - 1:
                    add(pl[:, :, x, kt])
                elif x == w + dd - 1:
                    add(pl[:, :, x, kt] - cl2[:, :, w + dd, kt])
                elif x == w + dd:
                    add(cl0[:, :, w + dd - 1, kt])
            # ---- right half
            if dd == 0:
                add(pr[:, :, x, kt])
            elif dd > 0:
                if x >= dd:
                    add(pr[:, :, x - dd, kt])
                    if x == w - 1:
                        add(-cr2[:, :, w - dd, kt])
                elif x == dd - 1:
                    add(cr2[:, :, 0, kt])
            else:  # dd < 0
                if x < w + dd:
                    add(pr[:, :, x - dd, kt])
                    if x == 0:
                        add(-cr0[:, :, -dd - 1, kt])
                elif x == w + dd:
                    add(cr0[:, :, w - 1, kt])
        return jnp.zeros((b, h, co), plsum.dtype) if acc is None else acc

    def slice_d(d):
        dd_live = [(kt, d + kt - 1) for kt in range(3)
                   if mind4 <= d + kt - 1 < maxd4]
        interior_ok = len(dd_live) == 3
        # columns where the closed-form interior is NOT exact: near the
        # mask/shift boundary of any live tap, plus the shifted right
        # half's image-edge columns
        fix = set()
        for _, dd in dd_live:
            if dd > 0:
                fix.update(range(max(dd - 1, 0), min(dd + 1, w)))  # dd-1, dd
                fix.add(w - 1)
            elif dd < 0:
                fix.update(range(max(w + dd - 1, 0), min(w + dd + 1, w)))
                fix.add(0)
        if interior_ok:
            # intersection interior mask over the three live left-half taps
            dds = [dd for _, dd in dd_live]
            lo = max([dd + 1 for dd in dds if dd > 0], default=0)
            hi = min([w + dd - 1 for dd in dds if dd < 0], default=w)
            m = ((cols >= lo) & (cols < hi))[None, None, :, None]
            base = jnp.where(m, plsum + _shift_cols(prsum, d), 0.0)
            # widen fix to every column outside the common-exact region that
            # any single tap still covers (partial-sum columns)
            for x in range(w):
                if not (lo <= x < hi):
                    fix.add(x)
            fix = {x for x in fix
                   if any((dd <= 0 and x < w + dd + 1) or (dd >= 0 and x >= dd - 1)
                          for _, dd in dd_live)}
        else:
            # depth-edge slice (d = mind4 or maxd4-1): per-tap masked sums
            base = jnp.zeros((b, h, w, co), plsum.dtype)
            for kt, dd in dd_live:
                if dd == 0:  # unmasked, unshifted: exact at every column
                    m = jnp.ones((1, 1, w, 1), bool)
                elif dd > 0:
                    m = (cols >= dd + 1)[None, None, :, None]
                else:
                    m = (cols < w + dd - 1)[None, None, :, None]
                base = base + jnp.where(
                    m, pl[:, :, :, kt] + _shift_cols(pr[:, :, :, kt], dd), 0.0)
                if dd > 0:
                    fix.update({dd - 1, dd, w - 1} & set(range(w)))
                elif dd < 0:
                    fix.update({w + dd - 1, w + dd, 0} & set(range(w)))
        if not fix:
            return base
        fcols = sorted(fix)
        band = jnp.stack([band_column(x, dd_live) for x in fcols], axis=2)
        fc = jnp.asarray(fcols)
        onehot = (cols[:, None] == fc[None, :]).astype(base.dtype)  # (W, F)
        keep = 1.0 - onehot.sum(axis=1)
        return base * keep[None, None, :, None] + jnp.einsum(
            "bhfc,wf->bhwc", band, onehot)

    # taps/corrections accumulate in f32 (matching the XLA conv's internal
    # accumulation); the packed output is cast to the input dtype, exactly
    # like conv3d_packed_r4's conv output
    slices = [slice_d(d).astype(dt) for d in range(mind4, maxd4)]
    groups = [jnp.concatenate(slices[g * gi: g * (gi + 1)], axis=-1)
              for gi in range(dg)]
    out = jnp.stack(groups, axis=1).reshape(b * dg, h, w, g * co)
    return out
