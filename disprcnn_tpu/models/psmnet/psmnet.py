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

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(train: bool, name=None):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel,) * self.dims
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(
            self.features, k, strides=(self.stride,) * self.dims,
            padding=[(pad, pad)] * self.dims,
            kernel_dilation=(self.dilation,) * self.dims,
            use_bias=False, dtype=self.dtype,
        )(x)
        return _bn(train)(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(
            ConvBN(self.planes, 3, self.stride, self.dilation, dtype=self.dtype)(x, train)
        )
        out = ConvBN(self.planes, 3, 1, self.dilation, dtype=self.dtype)(out, train)
        if self.downsample:
            x = nn.Conv(
                self.planes, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                dtype=self.dtype,
            )(x)
            x = _bn(train)(x)
        return out + x


class FeatureExtraction(nn.Module):
    """Siamese tower -> 1/4-res 32-ch features (submodule.py:234-313)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, stride in enumerate([2, 1, 1]):
            x = nn.relu(ConvBN(32, 3, stride, dtype=self.dtype)(x, train))

        def layer(x, planes, blocks, stride, dilation):
            x = BasicBlock(
                planes, stride, dilation,
                downsample=(stride != 1 or x.shape[-1] != planes), dtype=self.dtype,
            )(x, train)
            for _ in range(1, blocks):
                x = BasicBlock(planes, 1, dilation, dtype=self.dtype)(x, train)
            return x

        x = layer(x, 32, 3, 1, 1)
        raw = layer(x, 64, 16, 2, 1)  # 1/4 res
        x = layer(raw, 128, 3, 1, 1)
        skip = layer(x, 128, 3, 1, 2)  # dilated

        h, w = skip.shape[1], skip.shape[2]
        branches = [raw, skip]
        for pool in (56, 32, 16, 8):
            p = min(pool, h)
            y = nn.avg_pool(skip, (p, p), strides=(p, p))
            y = nn.relu(ConvBN(32, 1, dtype=self.dtype)(y, train))
            # reference upsamples SPP branches with align_corners=True
            # (submodule.py:120-133)
            y = bilinear_align_corners(y, (h, w))
            branches.append(y)
        x = jnp.concatenate(branches, axis=-1)  # 64+128+4*32 = 320
        x = nn.relu(ConvBN(128, 3, dtype=self.dtype)(x, train))
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


class Hourglass(nn.Module):
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool = False):
        p2 = self.planes * 2
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
        up1 = _bn(train)(up1)
        post = nn.relu(up1 + (presqu if presqu is not None else pre))  # 1/8

        up2 = nn.ConvTranspose(
            self.planes, (3, 3, 3), strides=(2, 2, 2), padding=[(1, 2)] * 3,
            use_bias=False, dtype=self.dtype,
        )(post)
        up2 = _bn(train)(up2)
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
    """Full iDispNet. __call__(left, right) -> pred3 (eval) or (p1, p2, p3)."""

    maxdisp: int = 48
    mindisp: int = -48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        b, h, w, _ = left.shape
        feat = FeatureExtraction(dtype=self.dtype, name="feature_extraction")
        # siamese: one tower, batched over both views (TPU-friendly single pass)
        both = feat(jnp.concatenate([left, right], axis=0), train)
        lf, rf = both[:b], both[b:]

        cost = build_cost_volume(lf, rf, self.mindisp // 4, self.maxdisp // 4)

        x = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres0_0")(cost, train))
        x = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres0_1")(x, train))
        y = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres1_0")(x, train))
        y = ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres1_1")(y, train)
        cost0 = y + x

        out1, pre1, post1 = Hourglass(32, dtype=self.dtype, name="dres2")(cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = Hourglass(32, dtype=self.dtype, name="dres3")(out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, pre3, post3 = Hourglass(32, dtype=self.dtype, name="dres4")(out2, pre1, post2, train)
        out3 = out3 + cost0

        def classif(z, name):
            z = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name=f"{name}_0")(z, train))
            return nn.Conv(
                1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False, dtype=self.dtype,
                name=f"{name}_1",
            )(z)

        cost1 = classif(out1, "classif1")
        cost2 = classif(out2, "classif2") + cost1
        cost3 = classif(out3, "classif3") + cost2

        d_full = self.maxdisp - self.mindisp

        def regress(c):
            c = trilinear_align_corners(c[..., 0], (d_full, h, w))
            p = jax.nn.softmax(c, axis=1)
            return soft_argmin(p, self.mindisp, self.maxdisp)

        if train:
            return regress(cost1), regress(cost2), regress(cost3)
        return regress(cost3)
