"""DispModule: the FPN-feature variant of iDispNet.

Reference: modeling/psmnet/dispmodule.py:18-354. Instead of running the full
siamese PSMNet on raw 224^2 crops, this variant pools width-aligned L/R ROI
features from every FPN level (channel-concat), reduces them with CONV_LAYERS,
and runs the PSMNet 3D cost-volume trunk at ROI resolution (28), with
deep-supervised masked smooth-L1 against ROI-warped GT disparity at
DISP_RESOLUTIONS (112). Includes the ROILevelMapper multi-resolution variant's
area-based routing (dispmodule.py:18-49) as `roi_resolution_keep`.

NOTE: the reference's exact graph is PROVABLY DEAD CODE — adjudicated by
tests/test_dispmodule_dead.py against the vendored torch source: the inner
PSMNet ctor (dispmodule.py:73-75) passes positionally-scrambled args that
stackhourglass.py:55-104 then entirely ignores, so the built module is the
stock 3-channel-image PSMNet; DispModule.forward then feeds it 1024-channel
ROI-pooled FPN features (dispmodule.py:277), which the image tower rejects
with a channel-mismatch RuntimeError on every invocation. No shipped config
can run it (the 3-stage configs keep DISPNET_ON=False). This
reimplementation therefore follows the documented intent: features -> 32ch
reduce -> shift-concat cost volume -> hourglass trio -> soft-argmin.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import roi_align_batched
from .psmnet import ConvBN, Hourglass, build_cost_volume, soft_argmin, trilinear_align_corners


def expand_left_right_freex(
    left: jnp.ndarray, right: jnp.ndarray, image_w: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Give both views a common width = max(w_l, w_r), clamped so the left box
    stays inside the image (dispmodule.py:90-104)."""
    lw = left[:, 2] - left[:, 0]
    rw = right[:, 2] - right[:, 0]
    w = jnp.minimum(jnp.maximum(lw, rw), image_w - left[:, 0])
    le = left.at[:, 2].set(left[:, 0] + w)
    re = right.at[:, 2].set(right[:, 0] + w)
    return le, re


def roi_resolution_keep(
    boxes: jnp.ndarray, resolutions: Sequence[int], resolution: int,
    method: str = "nearest",
) -> jnp.ndarray:
    """Area-based routing of ROIs to pooling resolutions
    (dispmodule.ROILevelMapper:18-49)."""
    areas = [(r * 4) ** 2 for r in resolutions]
    i = list(resolutions).index(resolution)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    if method == "nearest":
        lo = -jnp.inf if i == 0 else (areas[i] + areas[i - 1]) / 2
        hi = jnp.inf if i == len(resolutions) - 1 else (areas[i] + areas[i + 1]) / 2
    else:
        lo = -jnp.inf if i == 0 else areas[i - 1]
        hi = jnp.inf if i == len(resolutions) - 1 else areas[i]
    return (area >= lo) & (area < hi)


class DispModule(nn.Module):
    maxdisp: int = 48
    mindisp: int = -48
    resolution: int = 28
    disp_resolution: int = 112
    pooler_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    conv_layers: Tuple[int, ...] = (256,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        left_feats,  # list of (B, H_l, W_l, C) FPN maps
        right_feats,
        left_boxes: jnp.ndarray,  # (R, 4) width-aligned
        right_boxes: jnp.ndarray,
        batch_idx: jnp.ndarray,  # (R,)
        train: bool = False,
    ):
        """-> ROI disparity (R, disp_resolution, disp_resolution)
        [train: the (p1, p2, p3) deep-supervision triple]."""

        def pool(feats, boxes):
            # callers pass row-major regular ROIs (batch_idx ==
            # repeat(arange(B), K)) -> batch-linear per-image contraction
            b = feats[0].shape[0]
            rpi = boxes.shape[0] // b if boxes.shape[0] % b == 0 else None
            per_level = [
                roi_align_batched(
                    f, boxes, batch_idx, self.resolution, spatial_scale=s,
                    sampling_ratio=self.sampling_ratio, rois_per_image=rpi,
                )
                for f, s in zip(feats, self.pooler_scales)
            ]
            return jnp.concatenate(per_level, axis=-1)  # (R, r, r, 4C)

        lx = pool(left_feats, left_boxes)
        rx = pool(right_feats, right_boxes)

        reduce = []
        for i, c in enumerate(self.conv_layers):
            reduce.append((c, i))
        x = jnp.concatenate([lx, rx], axis=0)
        for c, i in reduce:
            x = nn.relu(ConvBN(c, 3, dtype=self.dtype, name=f"reduce{i}")(x, train))
        x = nn.Conv(32, (1, 1), use_bias=False, dtype=self.dtype, name="reduce_out")(x)
        r = lx.shape[0]
        lf, rf = x[:r], x[r:]

        # disparity range in feature units: resolution/disp_resolution scale
        stride = self.disp_resolution // self.resolution  # e.g. 4
        cost = build_cost_volume(lf, rf, self.mindisp // stride, self.maxdisp // stride)

        y = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres0_0")(cost, train))
        y = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres0_1")(y, train))
        z = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres1_0")(y, train))
        z = ConvBN(32, 3, dims=3, dtype=self.dtype, name="dres1_1")(z, train)
        cost0 = z + y
        out1, pre1, post1 = Hourglass(32, dtype=self.dtype, name="dres2")(cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = Hourglass(32, dtype=self.dtype, name="dres3")(out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, _, _ = Hourglass(32, dtype=self.dtype, name="dres4")(out2, pre1, post2, train)
        out3 = out3 + cost0

        def classif(v, name):
            v = nn.relu(ConvBN(32, 3, dims=3, dtype=self.dtype, name=f"{name}_0")(v, train))
            return nn.Conv(1, (3, 3, 3), padding=[(1, 1)] * 3, use_bias=False,
                           dtype=self.dtype, name=f"{name}_1")(v)

        c1 = classif(out1, "classif1")
        c2 = classif(out2, "classif2") + c1
        c3 = classif(out3, "classif3") + c2
        d_full = self.maxdisp - self.mindisp
        dr = self.disp_resolution

        def regress(c):
            c = trilinear_align_corners(c[..., 0], (d_full, dr, dr))
            return soft_argmin(jax.nn.softmax(c, axis=1), self.mindisp, self.maxdisp)

        if train:
            return regress(c1), regress(c2), regress(c3)
        return regress(c3)
