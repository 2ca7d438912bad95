"""ResNet backbone (Flax, NHWC) with frozen batch-norm.

Capability-equivalent to the reference backbone (modeling/backbone/resnet.py:
1-421): ResNet-50/101/152 bottleneck stacks with FrozenBatchNorm2d, optional
GroupNorm, stride-in-1x1 convs, stage freezing via ``FREEZE_CONV_BODY_AT``, and
C2..C5 multi-scale outputs for FPN.

TPU design notes:
- NHWC layout (channels map to TPU lanes), bf16-friendly: compute dtype is a
  module parameter; params stay f32.
- FrozenBatchNorm stores (scale, bias, mean, var) in a separate ``frozen``
  variable collection: excluded from `params`, so optimizers never see them
  and the (1/std*gamma, beta-mean*gamma/std) affine folds into the surrounding
  convolution at XLA fusion time.
- Stage freezing is implemented in the solver via optax masking + an optional
  stop_gradient boundary here (matches reference _freeze_backbone semantics).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

STAGE_BLOCKS = {
    "R-50": (3, 4, 6, 3),
    "R-101": (3, 4, 23, 3),
    "R-152": (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BN with constant statistics and affine (reference layers/batch_norm.py).

    Variables live in the `frozen` collection; y = (x - mean) * gamma/sqrt(var+eps) + beta
    reduces to a per-channel affine that XLA fuses into adjacent convs.
    """

    features: int
    eps: float = 1e-5  # the reference's FrozenBatchNorm2d subclasses
    # nn.BatchNorm2d with its custom forward COMMENTED OUT (layers/
    # batch_norm.py) — at eval it IS BatchNorm2d: running stats + eps 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.variable("frozen", "scale", jnp.ones, shape).value
        bias = self.variable("frozen", "bias", jnp.zeros, shape).value
        mean = self.variable("frozen", "mean", jnp.zeros, shape).value
        var = self.variable("frozen", "var", jnp.ones, shape).value
        mul = scale * jax.lax.rsqrt(var + self.eps)
        return x * mul.astype(x.dtype) + (bias - mean * mul).astype(x.dtype)


def _norm(use_gn: bool, features: int, gn_groups: int = 32):
    if use_gn:
        return nn.GroupNorm(num_groups=gn_groups, epsilon=1e-5)
    return FrozenBatchNorm(features)


class Bottleneck(nn.Module):
    in_channels: int
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        conv = lambda f, k, s, d=1, name=None: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(d * (k // 2),) * 2] * 2,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype, name=name,
        )

        residual = x
        if self.stride != 1 or self.in_channels != self.out_channels:
            residual = conv(self.out_channels, 1, self.stride, name="downsample_conv")(x)
            residual = _norm(self.use_gn, self.out_channels)(residual)

        out = conv(self.bottleneck_channels, 1, s1, name="conv1")(x)
        out = nn.relu(_norm(self.use_gn, self.bottleneck_channels)(out))
        out = conv(self.bottleneck_channels, 3, s3, self.dilation, name="conv2")(out)
        out = nn.relu(_norm(self.use_gn, self.bottleneck_channels)(out))
        out = conv(self.out_channels, 1, 1, name="conv3")(out)
        out = _norm(self.use_gn, self.out_channels)(out)
        return nn.relu(out + residual)


class Stem(nn.Module):
    out_channels: int = 64
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(_norm(self.use_gn, self.out_channels)(x))
        # 3x3 max-pool stride 2, padding=0 with CEIL_MODE (resnet.py:337 —
        # this fork uses the Caffe-style stem pool, NOT torchvision's pad-1):
        # trailing -inf pad up to ceil coverage reproduces ceil_mode exactly
        h, w = x.shape[1], x.shape[2]
        hi_h = max(0, -((h - 3) // -2) * 2 + 3 - h)
        hi_w = max(0, -((w - 3) // -2) * 2 + 3 - w)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(0, hi_h), (0, hi_w)])
        return x


class ResNet(nn.Module):
    """Returns (C2, C3, C4, C5) NHWC feature maps."""

    body: str = "R-101"
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    use_gn: bool = False
    freeze_at: int = 2
    num_stages: int = 4  # 3 => C4 body (stem + res2-4), reference _STAGE_SPECS R-50-C4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        blocks = STAGE_BLOCKS[self.body.replace("-FPN", "").replace("-C4", "").replace("-C5", "")]
        blocks = blocks[: self.num_stages]
        x = Stem(self.stem_out_channels, self.use_gn, self.dtype, name="stem")(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        outs = []
        in_ch = self.stem_out_channels
        for stage_idx, n_blocks in enumerate(blocks):
            out_ch = self.res2_out_channels * (2 ** stage_idx)
            bottleneck_ch = self.num_groups * self.width_per_group * (2 ** stage_idx)
            dilation = self.res5_dilation if stage_idx == 3 else 1
            first_stride = 1 if stage_idx == 0 or dilation > 1 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    in_channels=in_ch if b == 0 else out_ch,
                    bottleneck_channels=bottleneck_ch,
                    out_channels=out_ch,
                    stride=first_stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    dilation=dilation,
                    use_gn=self.use_gn,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x)
            in_ch = out_ch
            if self.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        return tuple(outs)


class Stage5Head(nn.Module):
    """Res5 stage applied to pooled ROI features (reference
    ResNet50Conv5ROIFeatureExtractor, modeling/roi_heads/box_head/
    roi_box_feature_extractors.py — the C4 box-head path).

    Input (N, r, r, 1024) ROI features -> (N, r/2, r/2, 2048).
    """

    body: str = "R-50"
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_blocks = STAGE_BLOCKS[self.body.replace("-C4", "").replace("-C5", "")][3]
        in_ch = x.shape[-1]
        for b in range(n_blocks):
            x = Bottleneck(
                in_channels=in_ch if b == 0 else 2048,
                bottleneck_channels=self.num_groups * self.width_per_group * 8,
                out_channels=2048,
                stride=2 if b == 0 else 1,
                stride_in_1x1=self.stride_in_1x1,
                use_gn=self.use_gn,
                dtype=self.dtype,
                name=f"layer4_{b}",
            )(x)
        return x
