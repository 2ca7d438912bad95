"""PSMNet-style iDispNet: siamese features -> shift-concat cost volume ->
stacked-hourglass 3D convs -> soft-argmin disparity.

Reference: modeling/psmnet/{stackhourglass.py:54-174, submodule.py:1-313}.
Architecture constants (channel widths, block counts, SPP pool sizes,
disparity range handling incl. NEGATIVE mindisp) follow the reference; the
implementation is TPU-native:
- NHWC / NDHWC layouts (channels on lanes), bf16-capable compute dtype.
- The cost volume is a static stack of shifted, masked channel-concats (no
  python-loop scatter writes); XLA fuses the shifts into the first 3D conv's
  input.
- Trilinear align_corners=True upsampling is expressed as three per-axis
  interpolation-matrix contractions (einsum -> MXU) instead of gather ops.
- BatchNorm uses flax running stats (momentum 0.9 == torch 0.1, eps 1e-5).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.pallas import kernel_disabled, kernel_forced

# tests set this True to run the fused Pallas kernels interpreted on CPU
_FORCE_INTERPRET = False
from ...ops.conv3d_packed import (
    conv2d_wpacked, conv3d_packed_r4, conv3d_packed_strided_r4,
    conv3d_packed_transposed_r4, pack_depth, repack_depth, unpack_depth,
    wpack, wunpack,
)


def _fold_bn_affine(scale, bias, mean, var, eps=1e-5):
    """Eval BN as a (mul, add) affine — single definition for every fused
    kernel path (drift here would silently desynchronize them)."""
    mul = scale * jax.lax.rsqrt(var + eps)
    return mul, bias - mean * mul


def _conv3d_min_hw() -> int:
    """Per-SITE spatial gate for the fused stride-1/deconv Pallas kernels.

    The round-3 family A/B (all sites share one tag) hid a big per-site
    variance — tools/bench_trunk_sites.py, TPU v5e, 2026-08-19:
        site (geometry)              pallas    xla
        dres_s1 (56^2, G=4)           1.136   3.397   -> Pallas wins 3x
        hg_s1_b (28^2, G=2)           0.588   0.321   -> XLA wins 1.8x
        hg_s1_d (14^2, G=1)           0.404   0.032   -> XLA wins 12x
        hg_deconv0 (14^2 in)          0.415   0.070   -> XLA wins 6x
        hg_deconv1 (28^2 in)          0.661   0.591   -> XLA wins
    The kernel's per-grid-step overhead dominates below ~2-3k spatial
    positions per N row; XLA's windowed banded conv is excellent there.
    Gate on the per-row H*W (input side), default 2000: full-res 56^2
    engages Pallas, 28^2/14^2 fall back to XLA."""
    import os

    return int(os.environ.get("DISPRCNN_CONV3D_MIN_HW", "2000"))


def _amortize_rows(work_per_row, n_rows, target=1500, cap=8):
    """Rows per Pallas grid step so each step's dot has >= `target` rows
    (below that the per-step overhead dominates — measured, see
    PackedConvBN3d). `work_per_row` is the DOT's row count contribution per
    N row: output positions for the convs (hw // stride^2), input positions
    for the deconv (its 9 dots run over input rows)."""
    rows = 1
    while work_per_row * rows < target and n_rows % (rows * 2) == 0 and rows < cap:
        rows *= 2
    return rows


def _bn(train: bool, name=None, dtype=None):
    # dtype: compute dtype for scale/shift (bf16 on TPU halves the HBM
    # traffic of every BN output and the residual adds that consume them);
    # batch statistics are still accumulated in f32 by flax.
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name,
        dtype=dtype,
    )


class _WPackedKernelConv(nn.Module):
    """3x3 SAME conv2d on a W-packed image (see ops/conv3d_packed.wpack).
    Param tree identical to the nn.Conv it replaces."""

    features: int
    group: int
    dtype: Any = jnp.float32
    in_features: int = 0  # required for raw=True (no input to infer Ci from)

    @nn.compact
    def __call__(self, xp=None, raw: bool = False):
        ci = self.in_features or xp.shape[-1] // self.group
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, ci, self.features), jnp.float32,
        )
        if raw:
            return kernel
        return conv2d_wpacked(
            xp.astype(self.dtype), kernel.astype(self.dtype), self.group
        )


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dims: int = 2
    dtype: Any = jnp.float32
    wpack: int = 0  # >0: input is W-packed with this group (2-D, k3 s1 only)

    @nn.compact
    def __call__(self, x, train: bool = False, relu: bool = False,
                 residual=None):
        """`relu`/`residual` fold the following activation / skip-add into
        the module so the eval TPU W-packed path runs conv+BN+add+ReLU as
        ONE Pallas kernel (ops/pallas/packed_conv.wpacked_conv_bn — same
        HBM-window argument as the 3-D trunk kernel). The residual joins
        before the ReLU. Semantics identical on the XLA path."""
        if self.wpack:
            assert self.dims == 2 and self.kernel == 3
            assert self.stride == 1 and self.dilation == 1
            conv = _WPackedKernelConv(
                self.features, self.wpack, self.dtype,
                in_features=x.shape[-1] // self.wpack, name="Conv_0",
            )
            # G-tiled BN (no rank-5 re-view: that re-tiles the lane axis and
            # XLA inserts a copy); stats identical to canonical BatchNorm
            bn = _PackedBN(
                self.features, self.wpack, dtype=self.dtype, name="BatchNorm_0"
            )
            hw = x.shape[1] * x.shape[2]
            use_pallas = (
                not train
                and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
                and not kernel_disabled("wconv")
                and not self.is_initializing()
                and hw >= 1500  # same per-grid-step overhead gate as 3-D
            )
            if use_pallas:
                from ...ops.conv3d_packed import pack_kernel_w
                from ...ops.pallas.packed_conv import wpacked_conv_bn

                kernel = conv(raw=True)
                mul, add = _fold_bn_affine(*bn(raw=True), eps=bn.epsilon)
                dt = self.dtype
                return wpacked_conv_bn(
                    x.astype(dt),
                    pack_kernel_w(kernel.astype(dt), self.wpack),
                    jnp.tile(mul, self.wpack), jnp.tile(add, self.wpack),
                    self.wpack, relu=relu,
                    residual=None if residual is None
                    else residual.astype(dt),
                    interpret=_FORCE_INTERPRET,
                )
            y = bn(conv(x), train)
        else:
            k = (self.kernel,) * self.dims
            pad = self.dilation * (self.kernel // 2)
            y = nn.Conv(
                self.features, k, strides=(self.stride,) * self.dims,
                padding=[(pad, pad)] * self.dims,
                kernel_dilation=(self.dilation,) * self.dims,
                use_bias=False, dtype=self.dtype,
            )(x)
            y = _bn(train, dtype=self.dtype)(y)
        if residual is not None:
            y = y + residual.astype(y.dtype)
        return nn.relu(y) if relu else y


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    wpack: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.wpack:
            assert self.stride == 1 and self.dilation == 1 and not self.downsample
        out = ConvBN(self.planes, 3, self.stride, self.dilation,
                     dtype=self.dtype, wpack=self.wpack)(x, train, relu=True)
        if self.downsample:
            sc = nn.Conv(
                self.planes, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                dtype=self.dtype,
            )(x)
            sc = _bn(train, dtype=self.dtype)(sc)
        else:
            sc = x
        # conv2 + BN + skip-add fused (no final activation in the PSMNet
        # BasicBlock, submodule.py:40-57)
        return ConvBN(self.planes, 3, 1, self.dilation, dtype=self.dtype,
                      wpack=self.wpack)(out, train, residual=sc)


class FeatureExtraction(nn.Module):
    """Siamese tower -> 1/4-res 32-ch features (submodule.py:234-313)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem conv1 native (C=3 input), then the half-res C=32 section runs
        # W-PACKED (4 columns folded into channels): a C=32 NHWC tensor tiles
        # to 32/128 lanes, so even its BN/relu fusions are 4x HBM traffic;
        # packing is a pure reshape here since W is adjacent to C.
        x = nn.relu(ConvBN(32, 3, 2, dtype=self.dtype, name="ConvBN_0")(x, train))
        wp = 4 if x.shape[2] % 4 == 0 else 0
        if wp:
            x = wpack(x, wp)
        x = ConvBN(32, 3, 1, dtype=self.dtype, wpack=wp, name="ConvBN_1")(
            x, train, relu=True)
        x = ConvBN(32, 3, 1, dtype=self.dtype, wpack=wp, name="ConvBN_2")(
            x, train, relu=True)

        def layer(x, planes, blocks, stride, dilation, wpk=0, wpk_rest=0):
            ch = x.shape[-1] // (wpk or 1)
            x = BasicBlock(
                planes, stride, dilation,
                downsample=(stride != 1 or ch != planes), dtype=self.dtype,
                wpack=wpk,
            )(x, train)
            # wpk_rest: pack only blocks 1.. (block 0 may stride/downsample,
            # which the packed conv does not support); used for the C=64
            # section where 2-wide packing fills all 128 lanes at a 4/3 FLOP
            # overhead (vs half-idle lanes unpacked)
            if wpk_rest and x.shape[2] % wpk_rest == 0:
                x = wpack(x, wpk_rest)
                for _ in range(1, blocks):
                    x = BasicBlock(planes, 1, dilation, dtype=self.dtype,
                                   wpack=wpk_rest)(x, train)
                return wunpack(x, wpk_rest)
            for _ in range(1, blocks):
                x = BasicBlock(planes, 1, dilation, dtype=self.dtype, wpack=wpk)(x, train)
            return x

        x = layer(x, 32, 3, 1, 1, wpk=wp)
        if wp:
            x = wunpack(x, wp)
        raw = layer(x, 64, 16, 2, 1, wpk_rest=2)  # 1/4 res
        x = layer(raw, 128, 3, 1, 1)
        skip = layer(x, 128, 3, 1, 2)  # dilated

        h, w = skip.shape[1], skip.shape[2]
        spp = []
        for bi, pool in enumerate((56, 32, 16, 8)):
            p = min(pool, h)
            y = nn.avg_pool(skip, (p, p), strides=(p, p))
            # explicit names continue the pre-wpack auto-numbering so
            # checkpoints/importers are unaffected
            y = nn.relu(
                ConvBN(32, 1, dtype=self.dtype, name=f"ConvBN_{3 + bi}")(y, train)
            )
            # reference upsamples SPP branches with align_corners=True
            # (submodule.py:120-133)
            y = bilinear_align_corners(y, (h, w))
            spp.append(y)
        # reference concat order: (raw, skip, branch4..branch1) — the 8-pool
        # branch FIRST (submodule.py:136-137); order matters for checkpoint
        # parity through lastconv
        x = jnp.concatenate([raw, skip] + spp[::-1], axis=-1)  # 320 ch
        x = nn.relu(ConvBN(128, 3, dtype=self.dtype, name="ConvBN_7")(x, train))
        return nn.Conv(32, (1, 1), use_bias=False, dtype=self.dtype)(x)


def build_cost_volume(
    left_f: jnp.ndarray,  # (B, H, W, C) quarter-res
    right_f: jnp.ndarray,
    mindisp4: int,
    maxdisp4: int,
) -> jnp.ndarray:
    """-> (B, D, H, W, 2C), D = maxdisp4 - mindisp4.

    Slice d holds concat(left[x], right[x - i]) at columns where the shifted
    pair is in-bounds, zero elsewhere (stackhourglass.py:117-128). Static
    stack of shifted slices — fuses into the following conv.
    """
    b, h, w, c = left_f.shape
    cols = jnp.arange(w)
    slices = []
    for i in range(mindisp4, maxdisp4):
        shifted = jnp.roll(right_f, i, axis=2)
        if i > 0:
            m = cols >= i
        elif i < 0:
            m = cols < w + i
        else:
            m = cols >= 0
        mask = m[None, None, :, None].astype(left_f.dtype)
        slices.append(jnp.concatenate([left_f * mask, shifted * mask], axis=-1))
    return jnp.stack(slices, axis=1)


def _shift_zerofill(f: jnp.ndarray, i: int) -> jnp.ndarray:
    """out[..., x, :] = f[..., x - i, :] where in-bounds, zero elsewhere.

    A pad-of-slice (ONE HLO pad op, fusible) — jnp.roll lowers to two slices
    + concat and still needs a separate mask multiply."""
    if i == 0:
        return f
    if i > 0:
        return jnp.pad(f[:, :, : f.shape[2] - i], ((0, 0), (0, 0), (i, 0), (0, 0)))
    return jnp.pad(f[:, :, -i:], ((0, 0), (0, 0), (0, -i), (0, 0)))


def build_cost_volume_packed(
    left_f: jnp.ndarray,
    right_f: jnp.ndarray,
    mindisp4: int,
    maxdisp4: int,
    g: int,
) -> jnp.ndarray:
    """Depth-packed cost volume: -> (B, D/G, H, W, G*2C). Same slices as
    build_cost_volume, but G consecutive disparity slices are concatenated on
    channels directly — no canonical (B, D, H, W, 2C) tensor, no transpose.

    Each channel block is a single pad-of-slice (left masked to the in-bounds
    columns == pad(left[:, :, i:]); right shifted-with-zero-fill), and each
    group is ONE flat concat of 2G such blocks. The earlier roll+mask-mul+
    nested-concat form materialized every disparity slice twice — measured
    ~2.8 ms of the PSMNet stage in pure data movement against a ~0.6 ms
    roofline for this tensor."""
    b, h, w, c = left_f.shape
    la, rb = _cost_volume_blocks(left_f, right_f, mindisp4, maxdisp4)
    dg = (maxdisp4 - mindisp4) // g
    groups = [
        jnp.concatenate(
            [t for pair in zip(la[g * gi : g * (gi + 1)],
                               rb[g * gi : g * (gi + 1)]) for t in pair],
            axis=-1,
        )
        for gi in range(dg)
    ]
    # rank-4 (B*Dg, H, W, G*2C): groups of the same image are consecutive
    return jnp.stack(groups, axis=1).reshape(b * dg, h, w, g * 2 * c)


def _cost_volume_blocks(left_f, right_f, mindisp4, maxdisp4):
    """Per-disparity channel blocks: (left masked to in-bounds columns,
    right shifted-with-zero-fill) — each a single pad-of-slice."""
    w = left_f.shape[2]
    la, rb = [], []
    for i in range(mindisp4, maxdisp4):
        # left mask cols >= i (i >= 0) / cols < w + i (i < 0): equals
        # zero-filling the already-sliced left
        if i >= 0:
            lm = jnp.pad(left_f[:, :, i:], ((0, 0), (0, 0), (i, 0), (0, 0)))
        else:
            lm = jnp.pad(left_f[:, :, : w + i], ((0, 0), (0, 0), (0, -i), (0, 0)))
        la.append(lm)
        rb.append(_shift_zerofill(right_f, i))
    return la, rb


def build_cost_volume_packed_split(
    left_f: jnp.ndarray,
    right_f: jnp.ndarray,
    mindisp4: int,
    maxdisp4: int,
    g: int,
):
    """-> (costa, costb): the packed cost volume as a channel-split PAIR —
    costa carries the left (masked) feature blocks, costb the shifted right
    blocks, each (B*Dg, H, W, G*C) slice-major. PackedConvBN3d's split path
    chains two Pallas kernels over the halves, so the interleaved
    (B*Dg, H, W, G*2C) tensor is never materialized (its first conv would
    also exceed the fused kernel's VMEM at Ci=64)."""
    b, h, w, c = left_f.shape
    la, rb = _cost_volume_blocks(left_f, right_f, mindisp4, maxdisp4)
    dg = (maxdisp4 - mindisp4) // g
    ga = [jnp.concatenate(la[g * gi : g * (gi + 1)], axis=-1) for gi in range(dg)]
    gb = [jnp.concatenate(rb[g * gi : g * (gi + 1)], axis=-1) for gi in range(dg)]
    return (
        jnp.stack(ga, axis=1).reshape(b * dg, h, w, g * c),
        jnp.stack(gb, axis=1).reshape(b * dg, h, w, g * c),
    )


class _PackedKernelConv(nn.Module):
    """conv3d (3x3x3, SAME, no bias, stride 1 or 2) on a RANK-4 depth-packed
    volume (N=B*Dg, H, W, G*Ci). Param tree is identical to the nn.Conv it
    replaces (one "kernel" (3,3,3,Ci,Co)); name it as that nn.Conv (e.g.
    "Conv_0") for checkpoint/import compatibility."""

    features: int
    group: int
    dg: int
    stride: int = 1
    dtype: Any = jnp.float32

    in_features: Optional[int] = None  # needed only for raw=True

    @nn.compact
    def __call__(self, x4=None, raw: bool = False):
        ci = self.in_features if x4 is None else x4.shape[-1] // self.group
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, ci, self.features), jnp.float32,
        )
        if raw:
            return kernel
        fn = conv3d_packed_r4 if self.stride == 1 else conv3d_packed_strided_r4
        return fn(x4.astype(self.dtype), kernel.astype(self.dtype),
                  self.group, self.dg)


class _PackedDeconv(nn.Module):
    """ConvTranspose3d(k=3, s=2, padding=(1,2)) on a rank-4 depth-packed
    volume. Param tree identical to flax ConvTranspose ("kernel"
    (3,3,3,Ci,Co))."""

    features: int
    group: int
    dg: int
    dtype: Any = jnp.float32
    in_features: Optional[int] = None  # needed only for raw=True

    @nn.compact
    def __call__(self, x4=None, raw: bool = False):
        ci = self.in_features if x4 is None else x4.shape[-1] // self.group
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, ci, self.features), jnp.float32,
        )
        if raw:
            return kernel
        return conv3d_packed_transposed_r4(
            x4.astype(self.dtype), kernel.astype(self.dtype), self.group, self.dg
        )


class _PackedBN(nn.Module):
    """BatchNorm over the true channel axis of a packed volume, applied with
    G-tiled scale/shift so the tensor stays rank-4 and lane-aligned (a
    (..., G, C) view re-tiles to (G-sublane, C-lane) — 4x padding for C=32).
    Variable tree is identical to flax nn.BatchNorm (params scale/bias,
    batch_stats mean/var, all (C,)); statistics match the canonical layout
    exactly (the packing is a permutation of the reduction set)."""

    features: int
    group: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x4=None, train: bool = False, raw: bool = False):
        c, g = self.features, self.group
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if raw:
            return scale, bias, ra_mean.value, ra_var.value
        if train:
            xf = x4.astype(jnp.float32)
            m_gc = jnp.mean(xf, axis=(0, 1, 2)).reshape(g, c)
            m2_gc = jnp.mean(xf * xf, axis=(0, 1, 2)).reshape(g, c)
            mean = jnp.mean(m_gc, axis=0)
            var = jnp.mean(m2_gc, axis=0) - mean * mean
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        mul_t = jnp.tile(mul, g).astype(self.dtype)
        add_t = jnp.tile(add, g).astype(self.dtype)
        return x4.astype(self.dtype) * mul_t + add_t


class PackedConvBN3d(nn.Module):
    """ConvBN(dims=3, k=3, s=1|2) on a rank-4 depth-packed volume (see
    ops/conv3d_packed.py for why: 32-channel conv3d uses 32/128 MXU lanes).

    `relu` / `residual` fold the following activation / skip-add into the
    module so the eval TPU path can run the whole conv+BN+add+ReLU as ONE
    Pallas kernel (ops/pallas/packed_conv.py: the XLA form spends ~40% of
    each conv materializing the halo window in HBM — 2.0 -> 1.13 ms/conv at
    the trunk geometry). The residual joins BEFORE the ReLU. Train (BN batch
    stats + autodiff) and CPU keep the XLA path; both paths share one param
    tree. `x4` may be a (xa, xb) tuple of channel-split volumes (the cost
    volume's left/right feature halves): the Pallas path chains two kernels
    over the split banded weights instead of building the concat — exact up
    to f32 accumulation order."""

    features: int
    group: int
    dg: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x4, train: bool = False, relu: bool = False,
                 residual=None, out_repack: bool = False, cost_volume=None):
        """out_repack=True returns (B, H, W, Dg*G*Co) — the classif heads'
        depth-major channel layout — written directly by the Pallas kernel's
        output BlockSpec instead of a separate full-volume transpose.

        cost_volume=(lf, rf, mindisp4): x4 is ignored and the module IS the
        cost-volume build + first conv. On the eval TPU path the volume is
        constructed inside the kernel (ops/pallas/packed_conv._kernel_cv) —
        it never exists in HBM; elsewhere it falls back to
        build_cost_volume_packed_split + the split path."""
        if cost_volume is not None:
            lf, rf, mind4 = cost_volume
            maxd4 = mind4 + self.dg * self.group
            # Geometry gate: the decomposition trades FLOPs for op COUNT —
            # its per-slice column corrections unroll into O(D*W) small
            # gathers/adds. At production trunk geometry (W=56, D=24,
            # W*D=1344) the 24x FLOP cut dominates; at tiny shapes the op
            # storm loses on every backend and blew the multichip dryrun's
            # CPU budget 3x (W=16, D=8: step exec 298s vs 113s). Floor is
            # env-tunable; DISPRCNN_PALLAS_ENABLE=cvdec bypasses it so the
            # parity tests/A-B ledger exercise the real path at any shape.
            cvdec_fits = (
                lf.shape[2] * self.dg * self.group
                >= int(os.environ.get("DISPRCNN_CVDEC_MIN_WD", "512"))
            ) or kernel_forced("cvdec")
            # Branch priority (measured, r4 ab_cvdec on-chip A/B): the fused
            # Pallas cv kernel beats the decomposition by 1.1 ms/fwd at
            # production trunk geometry (16x56x56, D=24) — the 24x true-FLOP
            # cut doesn't pay on the MXU where the dense form was already
            # bandwidth-bound and volume-free in VMEM. So eval TPU takes the
            # Pallas kernel; cvdec serves train + CPU (differentiable, every
            # backend) and A/B runs that force it.
            prefer_cv = (
                not train
                and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
                and not kernel_disabled("cv")
                and not kernel_forced("cvdec")
                and not self.is_initializing()
            )
            if (not prefer_cv
                    and not kernel_disabled("cvdec") and cvdec_fits
                    and not self.is_initializing()):
                # decomposed 2D-conv identity (ops/cv_conv.py): ~24x fewer
                # true FLOPs than any dense-3D-conv form, pure XLA and
                # differentiable — serves train AND eval, every backend
                from ...ops.cv_conv import cost_volume_conv_decomposed

                c = lf.shape[-1]
                conv = _PackedKernelConv(
                    self.features, self.group, self.dg, 1, self.dtype,
                    in_features=2 * c, name="Conv_0",
                )
                bn = _PackedBN(
                    self.features, self.group, dtype=self.dtype,
                    name="BatchNorm_0",
                )
                # TRAIN runs the decomposition in f32: its convs carry
                # preferred_element_type=f32, whose autodiff transpose feeds
                # the f32 cotangent back into a conv against the bf16 kernel
                # — lax.conv rejects mixed dtypes (caught by bench_full's
                # train-psm stage at the real 224^2 geometry; the tiny grads
                # parity test runs an f32 model and couldn't see it).
                # Uniform f32 keeps grads exact; even at f32 MXU rates the
                # 24x FLOP cut vs the dense form leaves it ~6x cheaper.
                dt = jnp.float32 if train else self.dtype
                y = cost_volume_conv_decomposed(
                    lf.astype(dt), rf.astype(dt), conv(raw=True).astype(dt),
                    mind4, maxd4, self.group,
                ).astype(self.dtype)
                y = bn(y, train)
                return nn.relu(y) if relu else y
            if (not train
                    and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
                    and not kernel_disabled("cv")
                    and not self.is_initializing()):
                from ...ops.conv3d_packed import pack_kernel
                from ...ops.pallas.packed_conv import cost_volume_conv_bn

                c = lf.shape[-1]
                conv = _PackedKernelConv(
                    self.features, self.group, self.dg, 1, self.dtype,
                    in_features=2 * c, name="Conv_0",
                )
                bn = _PackedBN(
                    self.features, self.group, dtype=self.dtype,
                    name="BatchNorm_0",
                )
                kernel = conv(raw=True)
                mulv, addv = _fold_bn_affine(*bn(raw=True), eps=bn.epsilon)
                dt = self.dtype
                return cost_volume_conv_bn(
                    lf.astype(dt), rf.astype(dt),
                    pack_kernel(kernel[:, :, :, :c, :].astype(dt), self.group),
                    pack_kernel(kernel[:, :, :, c:, :].astype(dt), self.group),
                    jnp.tile(mulv, self.group), jnp.tile(addv, self.group),
                    self.dg, self.group, mind4, relu=relu,
                    interpret=_FORCE_INTERPRET,
                )
            x4 = build_cost_volume_packed_split(lf, rf, mind4, maxd4,
                                                self.group)
        split = isinstance(x4, (tuple, list))
        ci_total = (
            sum(v.shape[-1] for v in x4) if split else x4.shape[-1]
        ) // self.group
        conv = _PackedKernelConv(
            self.features, self.group, self.dg, self.stride, self.dtype,
            in_features=ci_total, name="Conv_0",
        )
        g_out = self.group if self.stride == 1 else max(self.group // 2, 1)
        bn = _PackedBN(
            self.features, g_out, dtype=self.dtype, name="BatchNorm_0"
        )
        hw = (x4[0] if split else x4).shape[1] * (x4[0] if split else x4).shape[2]
        n_rows = (x4[0] if split else x4).shape[0]
        # below ~1500 spatial positions (output side) per grid-step the
        # kernel's per-step overhead dominates (hourglass half-res convs
        # regressed 1.55 -> 2.76 ms before this gate); multi-row steps
        # restore the amortization at small H*W instead of falling back to
        # XLA's HBM-windowed form
        eff = hw // (self.stride * self.stride)
        rows = _amortize_rows(eff, n_rows)
        use_pallas = (
            not train
            and self.stride in (1, 2)
            and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
            and not kernel_disabled("s2" if self.stride == 2 else "conv3d")
            and not self.is_initializing()
            and eff * rows >= 1500
            # per-site gate (measured, see above); interpret mode bypasses it
            # so the kernel paths stay test-covered at tiny shapes
            and (hw >= _conv3d_min_hw() or _FORCE_INTERPRET)
        )
        if use_pallas:
            from ...ops.conv3d_packed import pack_kernel, pack_kernel_strided
            from ...ops.pallas.packed_conv import (
                packed_conv_bn, packed_conv_bn_s2,
            )

            kernel = conv(raw=True)
            mul, add = _fold_bn_affine(*bn(raw=True), eps=bn.epsilon)
            dt = self.dtype
            if self.stride == 2:
                assert not split and residual is None and not out_repack
                return packed_conv_bn_s2(
                    x4.astype(dt),
                    pack_kernel_strided(kernel.astype(dt), self.group),
                    jnp.tile(mul, g_out), jnp.tile(add, g_out),
                    self.dg, self.group, relu=relu, rows=rows,
                    interpret=_FORCE_INTERPRET,
                )
            mul_t = jnp.tile(mul, self.group)
            add_t = jnp.tile(add, self.group)
            if split:
                # conv(xa;Ka) + conv(xb;Kb) + BN in ONE kernel pass (the
                # chained two-kernel form round-tripped the first half's
                # full volume through HBM as a residual)
                assert residual is None, "split + residual not supported"
                xa, xb = x4
                cia = xa.shape[-1] // self.group
                from ...ops.pallas.packed_conv import packed_conv_bn_pair

                return packed_conv_bn_pair(
                    xa.astype(dt), xb.astype(dt),
                    pack_kernel(kernel[:, :, :, :cia, :].astype(dt), self.group),
                    pack_kernel(kernel[:, :, :, cia:, :].astype(dt), self.group),
                    mul_t, add_t, self.dg, self.group, relu=relu, rows=rows,
                    interpret=_FORCE_INTERPRET,
                )
            return packed_conv_bn(
                x4.astype(dt),
                pack_kernel(kernel.astype(dt), self.group),
                mul_t, add_t, self.dg, self.group, relu=relu,
                residual=None if residual is None else residual.astype(dt),
                rows=1 if out_repack else rows, out_repack=out_repack,
                interpret=_FORCE_INTERPRET,
            )
        if split:
            # interleave channel halves back to slice-major [a_ci | b_ci]
            n, h, w = x4[0].shape[:3]
            parts = [v.reshape(n, h, w, self.group, -1) for v in x4]
            x4 = jnp.concatenate(parts, axis=-1).reshape(n, h, w, -1)
        use_pallas_train = (
            train
            and self.stride == 1
            and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
            and not kernel_disabled("convtrain")
            and not self.is_initializing()
            and eff * rows >= 1500
            and (hw >= _conv3d_min_hw() or _FORCE_INTERPRET)
        )
        if use_pallas_train:
            # fused VMEM window-build fwd + XLA-transpose bwd (custom_vjp,
            # ops/pallas/packed_conv.packed_conv_train); batch-stat BN stays
            # the XLA module below — it needs the raw conv output anyway
            from ...ops.pallas.packed_conv import packed_conv_train

            y = packed_conv_train(
                x4.astype(self.dtype), conv(raw=True).astype(self.dtype),
                self.dg, self.group, rows, _FORCE_INTERPRET,
            )
        else:
            y = conv(x4)
        y = bn(y, train)
        if residual is not None:
            y = y + residual.astype(y.dtype)
        y = nn.relu(y) if relu else y
        if out_repack:
            n, h, w = y.shape[:3]
            y = (y.reshape(n // self.dg, self.dg, h, w, -1)
                 .transpose(0, 2, 3, 1, 4)
                 .reshape(n // self.dg, h, w, -1))
        return y


class Hourglass(nn.Module):
    """Stacked-hourglass block (stackhourglass.py:8-52).

    packed_group=0: canonical NDHWC tensors (used by DispModule at ROI
    resolution). packed_group=G (e.g. 4): input/skips/outputs are
    depth-packed; every conv keeps 128 output lanes and no canonical
    5-D C=32 tensor is ever materialized (those tile to 32/128 lanes and
    turn the trunk into pure HBM copies — measured). Param trees of both
    paths are identical (explicit names mirror flax auto-naming)."""

    planes: int
    dtype: Any = jnp.float32
    packed_group: int = 0
    packed_dg: int = 0

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool = False,
                 final_residual=None):
        """final_residual is added to the up2 output (the trunk's
        `out_i + cost0p` skip) inside the fused deconv kernel on the eval
        TPU path — the sum never materializes separately."""
        p2 = self.planes * 2
        if self.packed_group:
            g, dg = self.packed_group, self.packed_dg  # e.g. 4, D/4 at full res
            out = PackedConvBN3d(p2, g, dg, 2, self.dtype, name="ConvBN_0")(
                x, train, relu=True
            )  # half res, group g/2
            pre = PackedConvBN3d(p2, g // 2, dg, 1, self.dtype, name="ConvBN_1")(
                out, train, relu=True, residual=postsqu
            )
            out = PackedConvBN3d(p2, g // 2, dg, 2, self.dtype, name="ConvBN_2")(
                pre, train, relu=True
            )  # quarter res, group g/4 (>=1)
            gq = max(g // 4, 1)
            out = PackedConvBN3d(p2, gq, dg, 1, self.dtype, name="ConvBN_3")(
                out, train, relu=True
            )

            def deconv_bn(v, feats, g_in, name_idx, relu, residual):
                dc = _PackedDeconv(
                    feats, g_in, dg, self.dtype,
                    in_features=v.shape[-1] // g_in,
                    name=f"ConvTranspose_{name_idx}",
                )
                bn = _PackedBN(
                    feats, 2 * g_in, dtype=self.dtype,
                    name=f"BatchNorm_{name_idx}",
                )
                hw = v.shape[1] * v.shape[2]
                if (not train
                        and (jax.default_backend() == "tpu"
                             or _FORCE_INTERPRET)
                        and not kernel_disabled("deconv")
                        and not self.is_initializing()
                        and (hw >= _conv3d_min_hw() or _FORCE_INTERPRET)):
                    # measured: both hourglass deconvs (14^2/28^2 inputs)
                    # lose to XLA — gated off unless DISPRCNN_CONV3D_MIN_HW
                    # is lowered
                    from ...ops.conv3d_packed import pack_kernel_transposed
                    from ...ops.pallas.packed_conv import packed_deconv_bn

                    kernel = dc(raw=True)
                    mul, add = _fold_bn_affine(*bn(raw=True), eps=bn.epsilon)
                    # input-hw: the deconv's 9 banded dots run over INPUT rows
                    rows = _amortize_rows(hw, v.shape[0])
                    dt = self.dtype
                    return packed_deconv_bn(
                        v.astype(dt),
                        pack_kernel_transposed(kernel.astype(dt), g_in),
                        jnp.tile(mul, 2 * g_in), jnp.tile(add, 2 * g_in),
                        dg, g_in, relu=relu,
                        residual=None if residual is None
                        else residual.astype(dt),
                        rows=rows,
                        interpret=_FORCE_INTERPRET,
                    )
                y = bn(dc(v), train)
                if residual is not None:
                    y = y + residual.astype(y.dtype)
                return nn.relu(y) if relu else y

            post = deconv_bn(out, p2, gq, 0, True,
                             presqu if presqu is not None else pre)
            up2 = deconv_bn(post, self.planes, g // 2, 1, False,
                            final_residual)
            return up2, pre, post
        out = nn.relu(ConvBN(p2, 3, 2, dims=3, dtype=self.dtype)(x, train))  # 1/8
        pre = ConvBN(p2, 3, 1, dims=3, dtype=self.dtype)(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

        out = nn.relu(ConvBN(p2, 3, 2, dims=3, dtype=self.dtype)(pre, train))  # 1/16
        out = nn.relu(ConvBN(p2, 3, 1, dims=3, dtype=self.dtype)(out, train))

        # torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1) doubles each
        # spatial dim with (lo, hi) = (1, 2) effective padding; flax 'SAME'
        # pads (2, 1), which shifts the upsampled volume by one voxel relative
        # to the presqu/postsqu skip additions — so pad explicitly.
        up1 = nn.ConvTranspose(
            p2, (3, 3, 3), strides=(2, 2, 2), padding=[(1, 2)] * 3,
            use_bias=False, dtype=self.dtype,
        )(out)
        up1 = _bn(train, dtype=self.dtype)(up1)
        post = nn.relu(up1 + (presqu if presqu is not None else pre))  # 1/8

        up2 = nn.ConvTranspose(
            self.planes, (3, 3, 3), strides=(2, 2, 2), padding=[(1, 2)] * 3,
            use_bias=False, dtype=self.dtype,
        )(post)
        up2 = _bn(train, dtype=self.dtype)(up2)
        if final_residual is not None:
            up2 = up2 + final_residual.astype(up2.dtype)
        return up2, pre, post


def _interp_matrix_align_corners(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """(n_out, n_in) linear-interp matrix with align_corners=True semantics."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / max(n_out - 1, 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = pos - i0
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, i0].add(1.0 - frac).at[rows, i0 + 1].add(frac)
    return m.astype(dtype)


def bilinear_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H', W', C) with align_corners=True semantics
    (reference SPP branches, submodule.py:120-133) via MXU contractions."""
    h, w = x.shape[1], x.shape[2]
    ho, wo = out_hw
    mh = _interp_matrix_align_corners(h, ho, x.dtype)
    mw = _interp_matrix_align_corners(w, wo, x.dtype)
    x = jnp.einsum("bhwc,eh->bewc", x, mh)
    return jnp.einsum("bhwc,ew->bhec", x, mw)


def trilinear_align_corners(x: jnp.ndarray, out_dhw: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W) -> (B, D', H', W') via three MXU matrix contractions."""
    d, h, w = x.shape[1:4]
    do, ho, wo = out_dhw
    md = _interp_matrix_align_corners(d, do, x.dtype)
    mh = _interp_matrix_align_corners(h, ho, x.dtype)
    mw = _interp_matrix_align_corners(w, wo, x.dtype)
    x = jnp.einsum("bdhw,ed->behw", x, md)
    x = jnp.einsum("bdhw,eh->bdew", x, mh)
    return jnp.einsum("bdhw,ew->bdhe", x, mw)


def soft_argmin(prob: jnp.ndarray, mindisp: int, maxdisp: int) -> jnp.ndarray:
    """(B, D, H, W) softmax probs -> (B, H, W) expected disparity
    (submodule.py:225-231 disparityregression)."""
    disp = jnp.arange(mindisp, maxdisp, dtype=prob.dtype)
    return jnp.einsum("bdhw,d->bhw", prob, disp)


class PSMNet(nn.Module):
    """Full iDispNet. __call__(left, right) -> pred (eval) or the
    deep-supervision tuple ((p1, p2, p3) at the default num_hourglass=3)."""

    maxdisp: int = 48
    mindisp: int = -48
    # 3 = reference (stackhourglass.py:130-144). Smaller values keep the
    # exact layer names/order of the first k hourglasses + classif heads —
    # used by the multichip dryrun to shrink the XLA:CPU compile, never by
    # the flagship configs.
    num_hourglass: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right, train: bool = False,
                 profile_stage: Optional[str] = None):
        """profile_stage (static, eval-profiling only): return early after
        'tower' | 'dres' | 'hg' | 'classif' — lets tools/profile_psmnet.py
        attribute latency per segment by differencing jitted prefixes."""
        b, h, w, _ = left.shape
        feat = FeatureExtraction(dtype=self.dtype, name="feature_extraction")
        # siamese: one tower, batched over both views (TPU-friendly single pass)
        both = feat(jnp.concatenate([left, right], axis=0), train)
        lf, rf = both[:b], both[b:]
        if profile_stage == "tower":
            return lf, rf

        d4 = (self.maxdisp - self.mindisp) // 4

        # The ENTIRE cost-volume trunk runs depth-PACKED: G consecutive
        # disparity slices fold into channels so every conv fills the MXU's
        # 128 output lanes AND every tensor tiles lane-perfectly (canonical
        # NDHWC C=32 tensors tile to 32/128 lanes: measured, the trunk
        # becomes HBM copies). Math identical — see ops/conv3d_packed.py.
        assert d4 % 4 == 0, "disparity range must be a multiple of 16"
        G = 4
        dg = d4 // G
        pc = partial(PackedConvBN3d, group=G, dg=dg, dtype=self.dtype)
        if (not kernel_disabled("cvdec")
                or (not train
                    and (jax.default_backend() == "tpu" or _FORCE_INTERPRET))):
            # cost-volume + dres0_0 via the decomposed 2D-conv identity
            # (ops/cv_conv.py, any backend/train) or the fused Pallas kernel
            # (eval TPU); the split XLA fallback runs during init
            x = pc(32, name="dres0_0")(
                None, train, relu=True,
                cost_volume=(lf, rf, self.mindisp // 4),
            )
        else:
            costp = build_cost_volume_packed(
                lf, rf, self.mindisp // 4, self.maxdisp // 4, G
            )
            x = pc(32, name="dres0_0")(costp, train, relu=True)
        x = pc(32, name="dres0_1")(x, train, relu=True)
        y = pc(32, name="dres1_0")(x, train, relu=True)
        cost0p = pc(32, name="dres1_1")(y, train, residual=x)
        if profile_stage == "dres":
            return cost0p

        hg = partial(Hourglass, 32, dtype=self.dtype, packed_group=G, packed_dg=dg)
        # the `+ cost0p` trunk skips ride the up2 deconv kernels as fused
        # residuals (stackhourglass.py:136-144 semantics, same adds).
        # Quirk kept from the reference: hourglass k>=2 receives pre1 (NOT
        # pre_{k-1}) as its presqu input (stackhourglass.py:139-141).
        outs, pres, posts = [], [], []
        inp = cost0p
        for i in range(self.num_hourglass):
            o, pre, post = hg(name=f"dres{2 + i}")(
                inp,
                None if i == 0 else pres[0],
                None if i == 0 else posts[-1],
                train, final_residual=cost0p)
            outs.append(o)
            pres.append(pre)
            posts.append(post)
            inp = o
        if profile_stage == "hg":
            return tuple(outs)

        h4, w4 = lf.shape[1], lf.shape[2]

        def classif(zp, name):
            # Co=1: repack to G=D so the final conv has D output lanes
            # instead of 1 (slice-major channel order kept: (dg, g, c)).
            # out_repack writes the depth-major layout straight from the
            # conv kernel — no separate full-volume transpose.
            zc = pc(32, name=f"{name}_0")(zp, train, relu=True, out_repack=True)
            zc = zc.reshape(b, h4, w4, d4 * 32)
            mod = _PackedKernelConv(
                1, d4, 1, dtype=self.dtype, name=f"{name}_1", in_features=32
            )
            if (not train
                    and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
                    and not kernel_disabled("cl1")
                    and not self.is_initializing()):
                # Pallas dg=1 path: no HBM window materialization (the XLA
                # windowed form concatenates a (B, H, W, 26*32) halo tensor)
                from ...ops.conv3d_packed import pack_kernel
                from ...ops.pallas.packed_conv import packed_conv_bn

                k = mod(raw=True)
                return packed_conv_bn(
                    zc.astype(self.dtype),
                    pack_kernel(k.astype(self.dtype), d4),
                    jnp.ones((d4,), jnp.float32), jnp.zeros((d4,), jnp.float32),
                    1, d4, relu=False, interpret=_FORCE_INTERPRET,
                )
            out = mod(zc)
            return out  # (B, H, W, D) channels-last disparity

        costs = []
        for i, o in enumerate(outs):
            c = classif(o, f"classif{i + 1}")
            costs.append(c if i == 0 else c + costs[-1])
        if profile_stage == "classif":
            return costs[-1]

        d_full = self.maxdisp - self.mindisp

        def regress(c):  # c: (B, H, W, D) channels-last disparity volume
            if (not train
                    and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
                    and not kernel_disabled("softargmin")):
                # fused Pallas upsample+softmax+expectation: the full-res
                # (B, H, W, D) volume never hits HBM (eval only — the train
                # path needs autodiff through the XLA ops below)
                from ...ops.pallas.softargmin import fused_softargmin

                return fused_softargmin(
                    c.astype(jnp.float32), (h, w), self.mindisp, self.maxdisp,
                    interpret=_FORCE_INTERPRET,
                )
            md = _interp_matrix_align_corners(c.shape[-1], d_full, c.dtype)
            mh = _interp_matrix_align_corners(c.shape[1], h, c.dtype)
            mw = _interp_matrix_align_corners(c.shape[2], w, c.dtype)
            c = jnp.einsum("bhwd,ed->bhwe", c, md)
            c = jnp.einsum("bhwd,eh->bewd", c, mh)
            c = jnp.einsum("bhwd,ew->bhed", c, mw)
            p = jax.nn.softmax(c, axis=-1)  # over disparity, on lanes
            disp = jnp.arange(self.mindisp, self.maxdisp, dtype=p.dtype)
            return jnp.einsum("bhwd,d->bhw", p, disp)

        if train:
            return tuple(regress(c) for c in costs)
        return regress(costs[-1])
