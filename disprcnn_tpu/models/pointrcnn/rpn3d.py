"""3D RPN over per-ROI pseudo-LiDAR clouds + proposal layer.

Reference: .../lib/net/rpn.py:12-120, rpn/proposal_layer.py:9-156,
net/rpn_loss.py. Each detected 2D instance contributes one 768-point cloud;
the "batch" axis is the padded instance axis.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.iou import boxes3d_to_bev
from ...ops.losses import dice_loss, sigmoid_focal_loss_binary
from ...ops.nms import bev_nms_mask, topk_after_nms
from . import bbox3d_codec as codec
from .pointnet2 import Pointnet2MSG


class ConvHead(nn.Module):
    """Per-point MLP head (pt_utils.Conv1d stack) with dropout after layer 0."""

    hidden: Sequence[int]
    out: int
    use_bn: bool = True
    dp_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.hidden):
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=self.dtype, name=f"fc{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"bn{i}", dtype=self.dtype,
                )(x)
            x = nn.relu(x)
            if i == 0 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        return nn.Dense(self.out, dtype=self.dtype, name="out")(x)


class RPN3D(nn.Module):
    """PointNet++ backbone + per-point cls/reg heads."""

    codec_cfg: codec.CodecCfg = codec.CodecCfg()
    cls_fc: Sequence[int] = (128,)
    reg_fc: Sequence[int] = (128,)
    use_bn: bool = True
    dp_ratio: float = 0.5
    npoints: Sequence[int] = (4096, 1024, 256, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts: jnp.ndarray, train: bool = False):
        """pts (R, N, 3) -> dict with per-point cls (R, N) and reg (R, N, C)."""
        xyz, feats = Pointnet2MSG(
            npoints=self.npoints, use_bn=self.use_bn, dtype=self.dtype, name="backbone"
        )(pts, None, train)
        cls = ConvHead(
            self.cls_fc, 1, self.use_bn, self.dp_ratio, self.dtype, name="cls_head"
        )(feats, train)[..., 0]
        reg = ConvHead(
            self.reg_fc, self.codec_cfg.reg_channels, self.use_bn, self.dp_ratio,
            self.dtype, name="reg_head",
        )(feats, train)
        return {"xyz": xyz, "features": feats, "cls": cls, "reg": reg}


def rpn_loss(
    cls_pred: jnp.ndarray,  # (R, N)
    reg_pred: jnp.ndarray,  # (R, N, C)
    cls_label: jnp.ndarray,  # (R, N) in {1, 0, -1}
    reg_label: jnp.ndarray,  # (R, N, 7)
    roi_valid: jnp.ndarray,  # (R,) instance validity
    anchor_size: jnp.ndarray,
    cfg: codec.CodecCfg,
    loss_cls: str = "SigmoidFocalLoss",
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    loss_weight: Tuple[float, float] = (1.0, 1.0),
):
    """-> dict(loss_rpn_cls, loss_rpn_reg) (reference rpn_loss.py:7-70)."""
    care = (cls_label >= 0) & roi_valid[:, None]
    pos = (cls_label > 0) & roi_valid[:, None]
    tgt = pos.astype(cls_pred.dtype)
    if loss_cls == "SigmoidFocalLoss":
        raw = sigmoid_focal_loss_binary(cls_pred, tgt, focal_gamma, focal_alpha)
        cls_l = jnp.sum(raw * care) / jnp.maximum(jnp.sum(pos), 1.0)
    elif loss_cls == "DiceLoss":
        p = jnp.where(care, jax.nn.sigmoid(cls_pred), 0.0)
        inter = jnp.sum(p * tgt)
        cls_l = 1.0 - (inter + 1e-5) / (jnp.sum(p) + jnp.sum(tgt) + 1e-5)
    else:  # BinaryCrossEntropy
        p = jax.nn.sigmoid(cls_pred)
        bce = -(tgt * jnp.log(jnp.clip(p, 1e-12)) + (1 - tgt) * jnp.log(jnp.clip(1 - p, 1e-12)))
        cls_l = jnp.sum(bce * care) / jnp.maximum(jnp.sum(care), 1.0)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    loc, angle, size = codec.reg_loss(
        flat(reg_pred), flat(reg_label), flat(pos).astype(reg_pred.dtype),
        anchor_size, cfg,
    )
    return {
        "loss_rpn_cls": cls_l * loss_weight[0],
        "loss_rpn_reg": (loc + angle + size) * loss_weight[1],
    }


def propose(
    cls_pred: jnp.ndarray,  # (R, N) raw scores
    reg_pred: jnp.ndarray,  # (R, N, C)
    xyz: jnp.ndarray,  # (R, N, 3)
    anchor_size: jnp.ndarray,
    cfg: codec.CodecCfg,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    rotated: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (rois (R, post, 7), scores (R, post), valid (R, post)).

    Reference score_based_proposal (proposal_layer.py:135-156): sort by score,
    pre-NMS top-k, BEV NMS (RPN.NMS_TYPE: 'normal' axis-aligned by default,
    'rotate' for rotated IoU), post-NMS top-k. Decoded y is shifted to the
    bottom face (proposal_layer.py:40).
    """

    def per_roi(scores, reg, pts):
        boxes = codec.decode(pts, reg, anchor_size, cfg)
        boxes = boxes.at[:, 1].add(boxes[:, 3] / 2)  # bottom-center y
        k = min(pre_nms_top_n, scores.shape[0])
        top_s, top_i = jax.lax.top_k(scores, k)
        b = boxes[top_i]
        keep = bev_nms_mask(
            boxes3d_to_bev(b), top_s, jnp.ones(k, bool), nms_thresh, rotated=rotated
        )
        idx, ok = topk_after_nms(keep, top_s, post_nms_top_n)
        return b[idx], top_s[idx], ok

    return jax.vmap(per_roi)(cls_pred, reg_pred, xyz)


def distance_propose(
    cls_pred: jnp.ndarray,  # (R, N) raw scores
    reg_pred: jnp.ndarray,  # (R, N, C)
    xyz: jnp.ndarray,  # (R, N, 3)
    anchor_size: jnp.ndarray,
    cfg: codec.CodecCfg,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    rotated: bool = False,
    nms_ranges: Tuple[float, float, float] = (0.0, 40.0, 80.0),
    near_frac: float = 0.7,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distance-based proposal (proposal_layer.py:70-134): split candidates
    into near (z in (0, 40]) and far (z in (40, 80]) bands with a 70/30
    pre/post budget split, run BEV NMS per band, concatenate. When the far
    band is empty the reference falls back to the near band's score-rank
    overflow window [pre_near, pre_near + pre_far) — reproduced here
    branchlessly."""
    pre1 = int(pre_nms_top_n * near_frac)
    pre2 = pre_nms_top_n - pre1
    post1 = int(post_nms_top_n * near_frac)
    post2 = post_nms_top_n - post1
    neg = -1e10

    def per_roi(scores, reg, pts):
        boxes = codec.decode(pts, reg, anchor_size, cfg)
        boxes = boxes.at[:, 1].add(boxes[:, 3] / 2)
        z = boxes[:, 2]
        band1 = (z > nms_ranges[0]) & (z <= nms_ranges[1])
        band2 = (z > nms_ranges[1]) & (z <= nms_ranges[2])

        s1 = jnp.where(band1, scores, neg)
        t1_s, t1_i = jax.lax.top_k(s1, pre1 + pre2)
        i1, v1 = t1_i[:pre1], t1_s[:pre1] > neg / 2
        over_i, over_v = t1_i[pre1:], t1_s[pre1:] > neg / 2

        any2 = jnp.any(band2)
        s2 = jnp.where(band2, scores, neg)
        t2_s, t2_i = jax.lax.top_k(s2, pre2)
        i2 = jnp.where(any2, t2_i, over_i)
        v2 = jnp.where(any2, t2_s > neg / 2, over_v)

        def band_nms(idx, vmask, post_n):
            b = boxes[idx]
            sc = jnp.where(vmask, scores[idx], neg)
            keep = bev_nms_mask(boxes3d_to_bev(b), sc, vmask, nms_thresh, rotated=rotated)
            kidx, kok = topk_after_nms(keep, sc, post_n)
            return b[kidx], scores[idx][kidx], kok

        b1, sc1, ok1 = band_nms(i1, v1, post1)
        b2, sc2, ok2 = band_nms(i2, v2, post2)
        return (
            jnp.concatenate([b1, b2]),
            jnp.concatenate([sc1, sc2]),
            jnp.concatenate([ok1, ok2]),
        )

    return jax.vmap(per_roi)(cls_pred, reg_pred, xyz)
