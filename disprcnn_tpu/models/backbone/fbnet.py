"""FBNet mobile backbone family (registry parity).

Reference: modeling/backbone/{fbnet.py, fbnet_builder.py, fbnet_modeldef.py}
(~1300 LoC) — a mobile inverted-residual architecture zoo reachable through
MODEL.BACKBONE.CONV_BODY = "FBNet" (unused by the shipped stereo configs).
This implementation provides the same capability surface: an arch-def zoo of
IRF (inverted residual) stages, a builder keyed by MODEL.FBNET.ARCH, width
scaling with divisor rounding, and detector-trunk-compatible multi-scale
outputs (C2..C5 strides 4/8/16/32).
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (expansion, out_channels, n_blocks, stride, kernel) per stage; stages are
# grouped by output stride. Derived from the public FBNet block tables.
ARCH_DEFS = {
    "default": [
        # stride 4 group
        [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3)],
        # stride 8
        [(6, 32, 3, 2, 5)],
        # stride 16
        [(6, 64, 3, 2, 5), (6, 96, 2, 1, 3)],
        # stride 32
        [(6, 160, 3, 2, 5), (6, 320, 1, 1, 3)],
    ],
    "fbnet_a": [
        [(1, 16, 1, 1, 3), (3, 24, 2, 2, 3)],
        [(6, 32, 3, 2, 5)],
        [(6, 64, 3, 2, 3), (6, 112, 2, 1, 5)],
        [(6, 184, 3, 2, 5), (6, 352, 1, 1, 3)],
    ],
    "fbnet_c": [
        [(1, 16, 1, 1, 3), (6, 24, 2, 2, 5)],
        [(6, 32, 3, 2, 5)],
        [(6, 64, 3, 2, 5), (6, 112, 3, 1, 5)],
        [(6, 184, 4, 2, 5), (6, 352, 1, 1, 3)],
    ],
}


def _round_channels(c: float, divisor: int = 8) -> int:
    out = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if out < 0.9 * c:
        out += divisor
    return out


class IRFBlock(nn.Module):
    """Inverted residual: 1x1 expand -> depthwise kxk -> 1x1 project."""

    out_channels: int
    expansion: int
    stride: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expansion
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5)
        y = x
        if self.expansion != 1:
            y = nn.relu(bn()(nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(y)))
        y = nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding="SAME", feature_group_count=mid, use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.relu(bn()(y))
        y = bn()(nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(y))
        if self.stride == 1 and cin == self.out_channels:
            y = y + x
        return y


class FBNet(nn.Module):
    """Mobile trunk -> (C2, C3, C4, C5) multi-scale features."""

    arch: str = "default"
    scale_factor: float = 1.0
    width_divisor: int = 8
    stem_channels: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5)
        stem = _round_channels(self.stem_channels * self.scale_factor, self.width_divisor)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.relu(bn()(x))
        outs = []
        for gi, group in enumerate(ARCH_DEFS[self.arch]):
            for e, c, n, s, k in group:
                c = _round_channels(c * self.scale_factor, self.width_divisor)
                for b in range(n):
                    x = IRFBlock(
                        out_channels=c, expansion=e, stride=s if b == 0 else 1,
                        kernel=k, dtype=self.dtype,
                    )(x, train)
            outs.append(x)
        return tuple(outs)
