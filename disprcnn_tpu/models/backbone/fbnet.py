"""FBNet mobile backbone family — full arch-def zoo + builder parity.

Reference: modeling/backbone/{fbnet.py,fbnet_builder.py,fbnet_modeldef.py}.
The MODEL_ARCH tables below reproduce the reference zoo verbatim (they ARE
the public architecture API — the per-block [t, c, n, s] numbers and op
types are data, not code); the builder reproduces the reference's channel
arithmetic exactly:

- out_depth  = _get_divisible_by(int(c * width_ratio), divisor, divisor)
  (fbnet_builder.py:823-829 _get_divisible_width)
- mid_depth  = _get_divisible_by(int(c_in * t), divisor, divisor)
  (IRFBlock, fbnet_builder.py:468-470) — expansion is on the INPUT depth
- the 1x1 expand conv exists even at t=1 (unlike torchvision MobileNetV2)
- dw conv: depthwise kxk, BN/ReLU skipped per DW_CONV_SKIP_{BN,RELU}
  (reference defaults True/True)
- negative stride = nearest-neighbour upsample by |s| then stride 1
  (fbnet_builder.py:428-441, used by mask-head stages)

Param-count parity vs the VENDORED torch builder is tested for 3+ archs in
tests/test_fbnet_zoo.py. `FBNet.__call__` returns one feature per backbone
stage (the reference trunk returns only the last — multi-scale outputs feed
this framework's FPN wrapper instead).
"""
from __future__ import annotations

import copy
import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# -- arch zoo (fbnet_modeldef.py, verbatim data) ----------------------------
MODEL_ARCH = {
    "default": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k3"] * 2,
            ["ir_k3"] * 3,
            ["ir_k3"] * 7,
            ["ir_k3"] * 4,  # bbox head
            ["ir_k3"] * 3,  # rpn
            ["ir_k3"] * 5,  # mask head
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 24, 2, 2]],
                [[6, 32, 3, 2]],
                [[6, 64, 4, 2], [6, 96, 3, 1]],
                [[4, 160, 1, 2], [6, 160, 2, 1], [6, 240, 1, 1]],
                [[6, 96, 3, 1]],
                [[4, 160, 1, 1], [6, 160, 3, 1], [3, 80, 1, -2]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
            "mask": [6],
        },
    },
    "xirb16d_dsmask": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k3"] * 2,
            ["ir_k3"] * 3,
            ["ir_k3"] * 7,
            ["ir_k3"] * 4,  # bbox head
            ["ir_k3"] * 5,  # mask head
            ["ir_k3"] * 3,  # rpn
        ],
        "block_cfg": {
            "first": [16, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 32, 2, 2]],
                [[6, 48, 3, 2]],
                [[6, 96, 4, 2], [6, 128, 3, 1]],
                [[4, 128, 1, 2], [6, 128, 2, 1], [6, 160, 1, 1]],
                [[4, 128, 1, 2], [6, 128, 2, 1], [6, 128, 1, -2], [3, 64, 1, -2]],
                [[6, 128, 3, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [6],
            "bbox": [4],
            "mask": [5],
        },
    },
    "mobilenet_v2": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k3"] * 2,
            ["ir_k3"] * 3,
            ["ir_k3"] * 7,
            ["ir_k3"] * 4,
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 16, 1, 1]],
                [[6, 24, 2, 2]],
                [[6, 32, 3, 2]],
                [[6, 64, 4, 2], [6, 96, 3, 1]],
                [[6, 160, 3, 1], [6, 320, 1, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "bbox": [4],
        },
    },
    "cham_v1a": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k7"] * 2,
            ["ir_k3"] * 5,
            ["ir_k5"] * 7 + ["ir_k3"] * 5,
            ["ir_k3"] * 5,  # bbox head
            ["ir_k3"] * 3,  # rpn
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 24, 1, 1]],
                [[4, 48, 2, 2]],
                [[7, 64, 5, 2]],
                [[12, 56, 7, 2], [8, 88, 5, 1]],
                [[7, 152, 4, 2], [10, 104, 1, 1]],
                [[8, 88, 3, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
        },
    },
    "cham_v2": {
        "block_op_type": [
            ["ir_k3"],
            ["ir_k5"] * 4,
            ["ir_k7"] * 6,
            ["ir_k5"] * 3 + ["ir_k3"] * 6,
            ["ir_k3"] * 7,  # bbox head
            ["ir_k3"] * 1,  # rpn
        ],
        "block_cfg": {
            "first": [32, 2],
            "stages": [
                [[1, 24, 1, 1]],
                [[8, 32, 4, 2]],
                [[5, 48, 6, 2]],
                [[9, 56, 3, 2], [6, 56, 6, 1]],
                [[2, 160, 6, 2], [6, 112, 1, 1]],
                [[6, 56, 1, 1]],
            ],
            "last": [0, 0.0],
            "backbone": [0, 1, 2, 3],
            "rpn": [5],
            "bbox": [4],
        },
    },
}

_KERNEL_BY_OP = {"ir_k1": 1, "ir_k3": 3, "ir_k5": 5, "ir_k7": 7}


def _py2_round(x: float) -> float:
    return math.floor(x + 0.5) if x >= 0.0 else math.ceil(x - 0.5)


def _get_divisible_by(num, divisible_by, min_val) -> int:
    """fbnet_builder.py:30-35 — NOT the tf-style round_channels."""
    ret = int(num)
    if divisible_by > 0 and num % divisible_by != 0:
        ret = int((_py2_round(num / divisible_by) or min_val) * divisible_by)
    return ret


def expand_stage_cfg(stage_cfg):
    """[t, c, n, s] -> n copies with stride only on the first."""
    ret = []
    for block in stage_cfg:
        for idx in range(block[2]):
            cur = copy.deepcopy(block)
            cur[2] = 1
            cur[3] = 1 if idx >= 1 else cur[3]
            ret.append(cur)
    return ret


def unify_arch_def(arch_def):
    """-> flat block list [{stage_idx, block_idx, block, block_op_type}]
    + first/backbone/... keys hoisted (fbnet_builder.py:641-677)."""
    ret = {k: v for k, v in arch_def["block_cfg"].items() if k != "stages"}
    blocks = []
    op_types = arch_def["block_op_type"]
    for si, stage in enumerate(arch_def["block_cfg"]["stages"]):
        expanded = expand_stage_cfg(stage)
        assert len(op_types[si]) == len(expanded), (si, op_types[si], expanded)
        for bi, (blk, op) in enumerate(zip(expanded, op_types[si])):
            blocks.append(
                {"stage_idx": si, "block_idx": bi, "block": blk,
                 "block_op_type": op}
            )
    ret["stages"] = blocks
    return ret


class ConvBNRelu(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_bn: bool = True
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class IRFBlock(nn.Module):
    """Inverted residual, reference-exact (fbnet_builder.py:445-560)."""

    out_channels: int
    expansion: int
    stride: int
    kernel: int = 3
    width_divisor: int = 1
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = _get_divisible_by(
            int(cin * self.expansion), self.width_divisor, self.width_divisor
        )
        y = ConvBNRelu(mid, kernel=1, dtype=self.dtype, name="pw")(x, train)
        stride = self.stride
        if stride < 0:  # upsample stage (mask heads)
            s = -stride
            y = jax.image.resize(
                y, (y.shape[0], y.shape[1] * s, y.shape[2] * s, y.shape[3]),
                method="nearest",
            )
            stride = 1
        if self.kernel > 1:
            y = ConvBNRelu(
                mid, kernel=self.kernel, stride=stride, groups=mid,
                use_bn=not self.dw_skip_bn, use_relu=not self.dw_skip_relu,
                dtype=self.dtype, name="dw",
            )(y, train)
        y = ConvBNRelu(
            self.out_channels, kernel=1, use_relu=False, dtype=self.dtype,
            name="pwl",
        )(y, train)
        if self.stride == 1 and cin == self.out_channels:
            y = y + x
        return y


class FBNet(nn.Module):
    """Mobile trunk -> one feature per backbone stage (multi-scale).

    `arch` keys MODEL_ARCH (MODEL.FBNET.ARCH names); `arch_def` overrides
    with an explicit table (MODEL.FBNET.ARCH_DEF). scale_factor /
    width_divisor / dw_skip_* mirror the MODEL.FBNET keys."""

    arch: str = "default"
    arch_def: Optional[dict] = None
    scale_factor: float = 1.0
    width_divisor: int = 1
    dw_skip_bn: bool = True
    dw_skip_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        table = self.arch_def if self.arch_def is not None else MODEL_ARCH[self.arch]
        arch = unify_arch_def(table)
        first_c, first_s = arch["first"][0], arch["first"][1]
        out = _get_divisible_by(
            int(first_c * self.scale_factor), self.width_divisor, self.width_divisor
        )
        x = ConvBNRelu(out, kernel=3, stride=first_s, dtype=self.dtype,
                       name="first")(x, train)
        keep = arch.get("backbone", sorted({b["stage_idx"] for b in arch["stages"]}))
        outs = []
        prev_stage = None
        for b in arch["stages"]:
            if b["stage_idx"] not in keep:
                continue
            if prev_stage is not None and b["stage_idx"] != prev_stage:
                outs.append(x)
            prev_stage = b["stage_idx"]
            t, c, n, s = b["block"]
            cout = _get_divisible_by(
                int(c * self.scale_factor), self.width_divisor, self.width_divisor
            )
            x = IRFBlock(
                out_channels=cout, expansion=t, stride=s,
                kernel=_KERNEL_BY_OP[b["block_op_type"]],
                width_divisor=self.width_divisor,
                dw_skip_bn=self.dw_skip_bn, dw_skip_relu=self.dw_skip_relu,
                dtype=self.dtype,
                name=f"xif{b['stage_idx']}_{b['block_idx']}",
            )(x, train)
        outs.append(x)
        return tuple(outs)
