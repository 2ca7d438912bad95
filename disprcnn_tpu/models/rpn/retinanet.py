"""RetinaNet single-stage detector (registry parity).

Reference: modeling/rpn/retinanet/{retinanet.py:13-152, inference.py, loss.py}
— reachable via MODEL.RETINANET_ON (unused by the shipped stereo configs but
part of the reference's surface). 4-conv cls/box towers shared across FPN
levels P3-P7, octave-scaled anchors, sigmoid focal loss, per-level top-k +
NMS postprocessing.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pairwise_iou
from ...ops.losses import sigmoid_focal_loss, smooth_l1
from ...ops.nms import nms_topk
from ...structures.boxes import Boxes2D
from . import box_coder
from .anchors import AnchorGenerator
from .matcher import match


class RetinaNetHead(nn.Module):
    num_classes: int = 80  # foreground classes (no background)
    num_anchors: int = 9
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_tower = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"cls_tower{i}")
            for i in range(self.num_convs)
        ]
        box_tower = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"bbox_tower{i}")
            for i in range(self.num_convs)
        ]
        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        cls_logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            bias_init=bias_init, dtype=self.dtype, name="cls_logits",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME", dtype=self.dtype,
            name="bbox_pred",
        )
        outs = []
        for f in feats:
            c, bx = f, f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in box_tower:
                bx = nn.relu(conv(bx))
            b, h, w, _ = f.shape
            outs.append(
                (
                    cls_logits(c).reshape(b, h * w * self.num_anchors, self.num_classes),
                    bbox_pred(bx).reshape(b, h * w * self.num_anchors, 4),
                )
            )
        return outs


def octave_anchor_generator(
    sizes=(32, 64, 128, 256, 512),
    strides=(8, 16, 32, 64, 128),
    ratios=(0.5, 1.0, 2.0),
    octave: float = 2.0,
    scales_per_octave: int = 3,
    straddle_thresh: float = 0,
) -> AnchorGenerator:
    """Anchors with scales_per_octave sub-scales per level
    (reference make_anchor_generator_retinanet)."""
    gen = AnchorGenerator.__new__(AnchorGenerator)
    from .anchors import cell_anchors

    gen.cells = []
    for st, sz in zip(strides, sizes):
        per = [sz * octave ** (i / scales_per_octave) for i in range(scales_per_octave)]
        gen.cells.append(cell_anchors(st, per, ratios))
    gen.strides = list(strides)
    gen.straddle_thresh = straddle_thresh
    return gen


def retinanet_loss(
    key,
    anchors: jnp.ndarray,
    cls_logits: jnp.ndarray,  # (B, N, C)
    box_deltas: jnp.ndarray,  # (B, N, 4)
    gt: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_iou: float = 0.5,
    bg_iou: float = 0.4,
    gamma: float = 2.0,
    alpha: float = 0.25,
    reg_weight: float = 4.0,
    reg_beta: float = 0.11,
):
    def per_image(cl, bd, g, glab, gv):
        quality = pairwise_iou(g, anchors)
        m = match(quality, gv, fg_iou, bg_iou, allow_low_quality=True)
        mi = jnp.maximum(m, 0)
        labels = jnp.where(m >= 0, glab[mi], jnp.where(m == -1, 0, -1))
        fl = sigmoid_focal_loss(cl, labels, gamma, alpha)
        n_pos = jnp.maximum(jnp.sum(labels > 0), 1.0)
        cls_l = jnp.sum(fl) / n_pos
        regt = box_coder.encode4(g[mi], anchors)
        box_l = jnp.sum(
            smooth_l1(bd - regt, beta=reg_beta) * (labels > 0)[:, None]
        ) / n_pos
        return cls_l, box_l

    cls_l, box_l = jax.vmap(per_image)(cls_logits, box_deltas, gt, gt_labels, gt_valid)
    return jnp.mean(cls_l), jnp.mean(box_l) * reg_weight / 4.0


def retinanet_postprocess(
    anchors: jnp.ndarray,
    cls_logits: jnp.ndarray,  # (N, C) one image
    box_deltas: jnp.ndarray,
    image_hw: Tuple[int, int],
    pre_nms_top_n: int = 1000,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.4,
    max_det: int = 100,
) -> Boxes2D:
    h, w = image_hw
    probs = jax.nn.sigmoid(cls_logits)
    best = jnp.max(probs, axis=-1)
    lbl = jnp.argmax(probs, axis=-1) + 1
    k = min(pre_nms_top_n, anchors.shape[0])
    top_s, top_i = jax.lax.top_k(best, k)
    boxes = box_coder.decode4(box_deltas[top_i], anchors[top_i])
    boxes = jnp.clip(boxes, jnp.zeros(4), jnp.asarray([w - 1.0, h - 1.0, w - 1.0, h - 1.0]))
    ok = top_s > score_thresh
    idx, kept = nms_topk(boxes, top_s, ok, nms_thresh, max_det)
    return Boxes2D(
        xyxy=boxes[idx], valid=kept, size=(w, h),
        fields={"scores": top_s[idx], "labels": lbl[top_i][idx]},
    )
