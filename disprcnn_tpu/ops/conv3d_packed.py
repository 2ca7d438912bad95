"""Disparity-packed 3D convolution: 3x3x3 stride-1 SAME conv3d re-laid-out as
a 2D conv whose channel axis carries G consecutive depth slices.

Why: the MXU is a 128x128 systolic array. PSMNet's cost-volume trunk runs
3D convs with 32 output channels (stackhourglass.py:130-144) — a native
NDHWC conv3d with Co=32 reaches ~16 TFLOP/s on-chip (measured) because only
32 of 128 output lanes are used. Packing G depth slices into channels makes
the conv's matmul (G+2)*Ci wide on the contraction and G*Co wide on the
output: for G=4, Co=32 the same math runs at >150 TFLOP/s for a 2x FLOP
overhead (the banded weight is (G+2)/3 denser than the true kernel), a net
~4.5x speedup per layer.

The transform is exact (identical arithmetic graph up to reassociation):
  out[b, g*G+j, h, w, co] =
      sum_{t,kh,kw,ci} x_pad[b, g*G+j+t, h+kh, w+kw, ci] * K[t,kh,kw,ci,co]
and the packed 2D conv computes exactly this with a block-banded dense
weight W2[kh, kw, (j+t)*Ci+ci, j*Co+co] = K[t, kh, kw, ci, co]
(zero elsewhere). Zero padding of the depth halo reproduces SAME padding.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pick_group(d: int, co: int) -> int:
    """Largest G dividing d with G*co <= 128 (full MXU output lanes)."""
    g = max(1, min(d, 128 // max(co, 1)))
    while g > 1 and d % g:
        g -= 1
    return g


def pack_kernel(kernel: jnp.ndarray, g: int) -> jnp.ndarray:
    """(3, kh, kw, Ci, Co) depth-kernel -> banded (kh, kw, (G+2)Ci, G*Co).

    Built as G pads of the contiguous 3Ci-row band + one concat: the
    .at[].set form emitted 3G serialized dynamic-update-slices PER CONV at
    runtime (the kernel is a param, so XLA cannot fold them) — measured
    ~1.1 ms/iter across the PSMNet trunk's ~30 packed convs."""
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3, "packed path is specialized to depth-kernel 3"
    kflat = kernel.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * ci, co)
    cols = [
        jnp.pad(kflat, ((0, 0), (0, 0), (j * ci, (g - 1 - j) * ci), (0, 0)))
        for j in range(g)
    ]
    return jnp.concatenate(cols, axis=-1)


def conv3d_packed(
    x: jnp.ndarray,  # (B, D, H, W, Ci)
    kernel: jnp.ndarray,  # (3, kh, kw, Ci, Co)
    g: Optional[int] = None,
) -> jnp.ndarray:
    """SAME, stride-1 conv3d via depth-packed 2D conv. -> (B, D, H, W, Co)."""
    b, d, h, w, ci = x.shape
    kd, kh, kw, _, co = kernel.shape
    if g is None:
        g = _pick_group(d, co)
    if g <= 1 or d % g or kd != 3:
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), [(kd // 2,) * 2, (kh // 2,) * 2, (kw // 2,) * 2],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    dg = d // g
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    # halo windows: group gi needs depth slices [gi*G, gi*G + G+2) of xp
    win = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, gi * g, g + 2, axis=1) for gi in range(dg)],
        axis=1,
    )  # (B, Dg, G+2, H, W, Ci)
    win = win.transpose(0, 1, 3, 4, 2, 5).reshape(b * dg, h, w, (g + 2) * ci)
    wp = pack_kernel(kernel, g)
    y = jax.lax.conv_general_dilated(
        win, wp, (1, 1), [(kh // 2,) * 2, (kw // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B*Dg, H, W, G*Co)
    y = y.reshape(b, dg, h, w, g, co).transpose(0, 1, 4, 2, 3, 5)
    return y.reshape(b, d, h, w, co)


def pack_depth(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, D, H, W, C) -> packed (B, D/G, H, W, G*C), slice-major channels."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // g, g, h, w, c).transpose(0, 1, 3, 4, 2, 5)
    return x.reshape(b, d // g, h, w, g * c)


def unpack_depth(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """Inverse of pack_depth."""
    b, dg, h, w, gc = x.shape
    c = gc // g
    x = x.reshape(b, dg, h, w, g, c).transpose(0, 1, 4, 2, 3, 5)
    return x.reshape(b, dg * g, h, w, c)


def repack_depth(x: jnp.ndarray, g_from: int, g_to: int) -> jnp.ndarray:
    """Change the packing group without a canonical round-trip."""
    if g_from == g_to:
        return x
    return pack_depth(unpack_depth(x, g_from), g_to)


def conv3d_packed_resident(
    xp: jnp.ndarray,  # packed (B, Dg, H, W, G*Ci)
    kernel: jnp.ndarray,  # (3, kh, kw, Ci, Co)
    g: int,
) -> jnp.ndarray:
    """SAME stride-1 conv3d on an already-packed volume -> packed
    (B, Dg, H, W, G*Co). The depth halo is two contiguous channel slices of
    the neighbouring groups (no per-slice gather), so consecutive trunk convs
    pay no repacking cost."""
    b, dg, h, w, gci = xp.shape
    ci = kernel.shape[3]
    assert gci == g * ci, (gci, g, ci)
    # previous group's last slice / next group's first slice, zero at edges
    prev = jnp.pad(xp[:, :-1, :, :, -ci:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    nxt = jnp.pad(xp[:, 1:, :, :, :ci], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    win = jnp.concatenate([prev, xp, nxt], axis=-1)  # (B, Dg, H, W, (G+2)Ci)
    kh, kw = kernel.shape[1], kernel.shape[2]
    wp = pack_kernel(kernel, g)
    y = jax.lax.conv_general_dilated(
        win.reshape(b * dg, h, w, (g + 2) * ci), wp, (1, 1),
        [(kh // 2,) * 2, (kw // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, dg, h, w, g * kernel.shape[4])


def pack_kernel_strided(kernel: jnp.ndarray, g_in: int) -> jnp.ndarray:
    """Depth-stride-2 banding: (3,kh,kw,Ci,Co) -> (kh,kw,(Gin+1)Ci,Gout*Co).

    Window channel order: [prev group's last slice, group slices 0..Gin-1].
    Output slice j (of Gout = Gin/2) consumes window slices 2j..2j+2
    (= input depth slices 2j-1..2j+1 relative to the group start)."""
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3
    g_out = max(g_in // 2, 1)
    # contiguous 3Ci-row band at rows 2j..2j+3: pads + concat (see pack_kernel)
    kflat = kernel.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * ci, co)
    cols = [
        jnp.pad(
            kflat,
            ((0, 0), (0, 0), (2 * j * ci, (g_in - 2 - 2 * j) * ci), (0, 0)),
        )
        for j in range(g_out)
    ]
    return jnp.concatenate(cols, axis=-1)


def conv3d_packed_strided(
    xp: jnp.ndarray, kernel: jnp.ndarray, g: int
) -> jnp.ndarray:
    """Stride-2 (all three dims), pad-1 conv3d on a packed volume:
    (B, Dg, H, W, G*Ci) -> (B, Dg, H/2, W/2, (G/2)*Co). Dg is unchanged —
    the depth halving happens inside the channel packing."""
    b, dg, h, w, gci = xp.shape
    ci, co = kernel.shape[3], kernel.shape[4]
    assert gci == g * ci
    prev = jnp.pad(xp[:, :-1, :, :, -ci:], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    win = jnp.concatenate([prev, xp], axis=-1)  # (B, Dg, H, W, (G+1)Ci)
    wp = pack_kernel_strided(kernel, g)
    y = jax.lax.conv_general_dilated(
        win.reshape(b * dg, h, w, (g + 1) * ci), wp, (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, dg, h // 2, w // 2, max(g // 2, 1) * co)


def pack_kernel_transposed(kernel: jnp.ndarray, g_in: int) -> jnp.ndarray:
    """Depth-fractional-stride banding for ConvTranspose(k=3, s=2, p=(1,2)):
    out[2j] = K[1] @ x[j];  out[2j+1] = K[0] @ x[j] + K[2] @ x[j+1].
    Window channel order: [group slices 0..Gin-1, next group's first slice].
    -> (kh, kw, (Gin+1)Ci, 2*Gin*Co)."""
    kd, kh, kw, ci, co = kernel.shape
    assert kd == 3
    # even output slice 2j: K[1] band at row j; odd slice 2j+1: the
    # contiguous [K[0]; K[2]] band at rows j..j+2 — pads + one concat
    # (see pack_kernel for why not .at[].set)
    kodd = jnp.concatenate([kernel[0], kernel[2]], axis=2)  # (kh, kw, 2Ci, Co)
    cols = []
    for j in range(g_in):
        cols.append(
            jnp.pad(kernel[1], ((0, 0), (0, 0), (j * ci, (g_in - j) * ci), (0, 0)))
        )
        cols.append(
            jnp.pad(kodd, ((0, 0), (0, 0), (j * ci, (g_in - 1 - j) * ci), (0, 0)))
        )
    return jnp.concatenate(cols, axis=-1)


def conv3d_packed_transposed(
    xp: jnp.ndarray, kernel: jnp.ndarray, g: int
) -> jnp.ndarray:
    """ConvTranspose3d(k=3, s=2, padding=(1,2)) on a packed volume:
    (B, Dg, H, W, G*Ci) -> (B, Dg, 2H, 2W, 2G*Co). Depth upsampling is
    folded into the channel banding; H/W use a 2-D conv_transpose
    (flax ConvTranspose semantics, transpose_kernel=False)."""
    b, dg, h, w, gci = xp.shape
    ci, co = kernel.shape[3], kernel.shape[4]
    assert gci == g * ci
    nxt = jnp.pad(xp[:, 1:, :, :, :ci], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    win = jnp.concatenate([xp, nxt], axis=-1)  # (B, Dg, H, W, (G+1)Ci)
    wp = pack_kernel_transposed(kernel, g)
    y = jax.lax.conv_transpose(
        win.reshape(b * dg, h, w, (g + 1) * ci), wp, (2, 2),
        ((1, 2), (1, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False,
    )
    return y.reshape(b, dg, 2 * h, 2 * w, 2 * g * co)


def _shift_groups(x4: jnp.ndarray, dg: int, ci: int, direction: int) -> jnp.ndarray:
    """Neighbour-group channel halo on a rank-4 packed volume
    (N=B*Dg, H, W, G*Ci). direction=-1: previous group's last slice;
    +1: next group's first slice. Zeros at depth boundaries (SAME padding).

    Rank-4 throughout: mixing rank-5 (B, Dg, ...) views with the rank-4
    conv operands makes XLA materialize a layout copy per conv (measured
    ~1.7 ms/conv of pure copies; re-verified round 2 — a slice+pad on the
    rank-5 view costs the trunk ~2 ms vs this where-form)."""
    n = x4.shape[0]
    gi = jnp.arange(n) % dg
    if direction < 0:
        h = jnp.concatenate(
            [jnp.zeros_like(x4[:1, :, :, -ci:]), x4[:-1, :, :, -ci:]], axis=0
        )
        edge = (gi == 0)[:, None, None, None]
    else:
        h = jnp.concatenate(
            [x4[1:, :, :, :ci], jnp.zeros_like(x4[:1, :, :, :ci])], axis=0
        )
        edge = (gi == dg - 1)[:, None, None, None]
    return jnp.where(edge, jnp.zeros((), x4.dtype), h)


def conv3d_packed_r4(
    x4: jnp.ndarray, kernel: jnp.ndarray, g: int, dg: int
) -> jnp.ndarray:
    """Stride-1 SAME conv3d on a rank-4 packed volume -> same rank/packing.

    Windowed form: halo slices concatenated on channels, one banded conv.
    (A main-plus-halo-correction split — banded middle rows on x4 directly
    plus two Ci->Co=32 corrective convs — cuts the counted FLOPs by 1/3 but
    measured 3 ms SLOWER on the trunk: the 32-lane corrective convs run at
    ~16 TFLOP/s, exactly the lane starvation the packing exists to avoid.)"""
    ci = kernel.shape[3]
    win = jnp.concatenate(
        [_shift_groups(x4, dg, ci, -1), x4, _shift_groups(x4, dg, ci, +1)],
        axis=-1,
    )
    kh, kw = kernel.shape[1], kernel.shape[2]
    return jax.lax.conv_general_dilated(
        win, pack_kernel(kernel, g), (1, 1),
        [(kh // 2,) * 2, (kw // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3d_packed_strided_r4(
    x4: jnp.ndarray, kernel: jnp.ndarray, g: int, dg: int
) -> jnp.ndarray:
    """Stride-2 pad-1 conv3d on a rank-4 packed volume: (N, H, W, G*Ci) ->
    (N, H/2, W/2, (G/2)*Co)."""
    ci = kernel.shape[3]
    win = jnp.concatenate([_shift_groups(x4, dg, ci, -1), x4], axis=-1)
    return jax.lax.conv_general_dilated(
        win, pack_kernel_strided(kernel, g), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3d_packed_transposed_r4(
    x4: jnp.ndarray, kernel: jnp.ndarray, g: int, dg: int
) -> jnp.ndarray:
    """ConvTranspose3d(k3, s2, p(1,2)) on a rank-4 packed volume: (N, H, W,
    G*Ci) -> (N, 2H, 2W, 2G*Co).

    The lax.conv_transpose (input-dilated) lowering is the FAST form on TPU:
    XLA's conv emitter skips the inserted zeros (its own cost model counts
    only the true 9/4 taps per output — verified: 2274 GFLOP for the trunk
    either way). An explicit output-parity (subpixel) decomposition into 4
    parity convs + interleave was tried and measured 1.9 ms SLOWER on the
    full PSMNet (the interleave stack/reshape copies are pure overhead).
    Don't re-attempt without evidence the emitter stopped handling dilation.
    """
    ci = kernel.shape[3]
    win = jnp.concatenate([x4, _shift_groups(x4, dg, ci, +1)], axis=-1)
    return jax.lax.conv_transpose(
        win, pack_kernel_transposed(kernel, g), (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=False,
    )


def wpack(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/G, G*C). W is adjacent to C in NHWC, so this
    is a pure reshape (no transpose) — and the packed tensor tiles
    lane-perfectly when G*C >= 128 (a C=32 tensor pads 32 -> 128 lanes: 4x
    wasted HBM bandwidth on every op that touches it)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // g, g * c)


def wunpack(x: jnp.ndarray, g: int) -> jnp.ndarray:
    b, h, wg, gc = x.shape
    return x.reshape(b, h, wg * g, gc // g)


def pack_kernel_w(kernel: jnp.ndarray, g: int) -> jnp.ndarray:
    """(kh, 3, Ci, Co) -> (kh, 1, (G+2)Ci, G*Co): the kw taps move into the
    channel banding (same scheme as pack_kernel, one spatial dim fewer)."""
    kh, kw, ci, co = kernel.shape
    assert kw == 3
    # contiguous 3Ci-row taps band (t-major): pads + concat, not .at[].set
    kflat = kernel.reshape(kh, 1, kw * ci, co)
    cols = [
        jnp.pad(kflat, ((0, 0), (0, 0), (j * ci, (g - 1 - j) * ci), (0, 0)))
        for j in range(g)
    ]
    return jnp.concatenate(cols, axis=-1)


def conv2d_wpacked(
    xp: jnp.ndarray,  # (B, H, Wg, G*Ci) W-packed
    kernel: jnp.ndarray,  # (kh, 3, Ci, Co)
    g: int,
) -> jnp.ndarray:
    """3x3 SAME stride-1 conv2d on a W-packed image -> (B, H, Wg, G*Co)."""
    b, h, wg, gci = xp.shape
    ci, co = kernel.shape[2], kernel.shape[3]
    assert gci == g * ci
    prev = jnp.pad(xp[:, :, :-1, -ci:], ((0, 0), (0, 0), (1, 0), (0, 0)))
    nxt = jnp.pad(xp[:, :, 1:, :ci], ((0, 0), (0, 0), (0, 1), (0, 0)))
    win = jnp.concatenate([prev, xp, nxt], axis=-1)
    wp = pack_kernel_w(kernel, g)
    kh = kernel.shape[0]
    return jax.lax.conv_general_dilated(
        win, wp, (1, 1), [(kh // 2,) * 2, (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class PackedConv3d(nn.Module):
    """Drop-in for `nn.Conv(features, (3,3,3), padding=SAME, use_bias=False)`
    with the depth-packed lowering. Param tree is identical to nn.Conv
    (a single "kernel" of shape (3,3,3,Ci,Co), lecun_normal init), so
    checkpoints and the torch importer are unaffected — give it the name
    the nn.Conv would have had (e.g. name="Conv_0")."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features), jnp.float32,
        )
        return conv3d_packed(x.astype(self.dtype), kernel.astype(self.dtype))
