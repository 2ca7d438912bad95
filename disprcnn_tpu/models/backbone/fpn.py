"""Feature Pyramid Network (reference modeling/backbone/fpn.py:7-103).

Lateral 1x1 convs + BILINEAR (align_corners=False) top-down upsampling +
3x3 output convs, plus LastLevelMaxPool producing P6. This fork deviates
from upstream maskrcnn-benchmark in three verified ways (see FPN.__call__).
NHWC, dtype-parameterized.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _interp_matrix_half_pixel(n_in: int, n_out: int, dtype=jnp.float32):
    """(n_out, n_in) linear-interp matrix, align_corners=False semantics."""
    pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
    pos = jnp.clip(pos, 0.0, n_in - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(n_in - 2, 0))
    frac = pos - i0
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, i0].add(1.0 - frac).at[rows, jnp.minimum(i0 + 1, n_in - 1)].add(frac)
    return m.astype(dtype)


def _bilinear_resize_half_pixel(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) as two matrix
    contractions (MXU work, not gathers)."""
    mh = _interp_matrix_half_pixel(x.shape[1], out_hw[0], x.dtype)
    mw = _interp_matrix_half_pixel(x.shape[2], out_hw[1], x.dtype)
    x = jnp.einsum("bhwc,oh->bowc", x, mh)
    return jnp.einsum("bhwc,ow->bhoc", x, mw)


class FPN(nn.Module):
    out_channels: int = 256
    use_gn: bool = False
    use_relu: bool = False
    top_blocks: str = "maxpool"  # "maxpool" (P6) | "p6p7" (retinanet) | "none"
    p6p7_use_c5: bool = True  # RETINANET.USE_C5 (default True): P6 from C5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        """features: (C2, C3, C4, C5) -> (P2, P3, P4, P5[, P6])."""
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=[(k // 2,) * 2] * 2, dtype=self.dtype, name=name,
            use_bias=not self.use_gn,
        )
        n = len(features)
        laterals = []
        for i, feat in enumerate(features):
            x = conv(self.out_channels, 1, f"lateral{i + 2}")(feat)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=32, epsilon=1e-5)(x)
            if self.use_relu:
                x = nn.relu(x)
            laterals.append(x)
        # Top-down pathway, matching THIS FORK's FPN exactly (fpn.py:52-68 —
        # it deviates from upstream maskrcnn-benchmark in three ways, all
        # verified by tests/test_backbone_reference_parity.py):
        # 1. the top level P5 is emitted as the BARE 1x1 lateral (its 3x3
        #    output conv is created but never applied),
        # 2. upsampling is BILINEAR align_corners=False (not nearest),
        # 3. the CONVOLVED result propagates to the next level down (not the
        #    pre-conv lateral sum).
        last = laterals[-1]
        outs = [last]
        for i in range(n - 2, -1, -1):
            lat = laterals[i]
            up = _bilinear_resize_half_pixel(last, (lat.shape[1], lat.shape[2]))
            last = conv(self.out_channels, 3, f"output{i + 2}")(lat + up)
            if self.use_gn:
                last = nn.GroupNorm(num_groups=32, epsilon=1e-5)(last)
            if self.use_relu:
                last = nn.relu(last)
            outs.insert(0, last)
        if self.top_blocks == "maxpool":
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        elif self.top_blocks == "p6p7":
            # LastLevelP6P7 (reference fpn.py:84-103): stride-2 3x3 convs;
            # P6 consumes C5 when RETINANET.USE_C5 (the reference default),
            # else P5 (backbone.py:54-58)
            p6_in = features[-1] if self.p6p7_use_c5 else outs[-1]
            p6 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)], dtype=self.dtype, name="p6_s2",
            )(p6_in)
            p7 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)], dtype=self.dtype, name="p7_s2",
            )(nn.relu(p6))
            outs.extend([p6, p7])
        return tuple(outs)


class ResNetFPNBackbone(nn.Module):
    """R-{50,101}-FPN composite (reference modeling/backbone/backbone.py:37-56)."""

    body: str = "R-101"
    out_channels: int = 256
    freeze_at: int = 2
    use_gn_body: bool = False
    use_gn_fpn: bool = False
    use_relu_fpn: bool = False
    stride_in_1x1: bool = True
    top_blocks: str = "maxpool"  # "maxpool" | "p6p7" | "none"
    skip_c2: bool = False  # retinanet: laterals on C3-C5 only (P3-P7)
    # MODEL.FBNET.* passthrough (active for CONV_BODY "FBNet[-<arch>]")
    fbnet_scale_factor: float = 1.0
    fbnet_width_divisor: int = 1
    fbnet_dw_skip_bn: bool = True
    fbnet_dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.body.startswith("FBNet"):
            from .fbnet import FBNet

            arch = self.body.split("-")[1] if "-" in self.body else "default"
            cs = FBNet(
                arch=arch,
                scale_factor=self.fbnet_scale_factor,
                width_divisor=self.fbnet_width_divisor,
                dw_skip_bn=self.fbnet_dw_skip_bn,
                dw_skip_relu=self.fbnet_dw_skip_relu,
                dtype=self.dtype, name="body",
            )(x)
        else:
            from .resnet import ResNet

            cs = ResNet(
                body=self.body,
                use_gn=self.use_gn_body,
                freeze_at=self.freeze_at,
                stride_in_1x1=self.stride_in_1x1,
                dtype=self.dtype,
                name="body",
            )(x)
        if self.skip_c2:
            cs = cs[1:]
        return FPN(
            out_channels=self.out_channels,
            use_gn=self.use_gn_fpn,
            use_relu=self.use_relu_fpn,
            top_blocks=self.top_blocks,
            dtype=self.dtype,
            name="fpn",
        )(cs)
