"""Stereo ROI box head: pooled L+R features -> class scores + 6-param deltas.

Reference components:
- StereoFPN2MLPFeatureExtractor (roi_box_feature_extractors.py:85-123):
  pool both views at 7x7, channel-concat, 7x7/stride-7 conv to MLP_HEAD_DIM,
  ReLU+dropout(0.2), 1x1 conv, ReLU+dropout, spatial mean.
- StereoFPNPredictor (roi_box_predictors.py:61-85): linear heads for
  num_classes scores and num_classes*6 deltas.
- FastRCNNLossComputation double-view path (loss.py:86-309): union-box IoU
  matching (0.5/0.5), balanced 512@0.25 sampling, CE + smooth-L1(beta=1) on
  the 6 deltas of the matched class, normalized by sampled count.
- PostProcessor double-view path (inference.py:86-275): per-class score
  threshold + LEFT-box NMS (use_keep='left'), detections capped per image.

Fixed-shape: proposals arrive as StereoBoxes(P); training subsamples to
ROI_BATCH rows (mask, not gather-compaction across images); inference emits
Boxes-per-class padded to DETECTIONS_PER_IMG.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pairwise_iou
from ...ops.losses import smooth_l1
from ...ops.nms import nms_topk
from ...structures.stereo import StereoBoxes
from ..rpn import box_coder
from ..rpn.matcher import balanced_sample, match
from .pooler import fpn_roi_align


class StereoBoxFeatureExtractor(nn.Module):
    mlp_dim: int = 2048
    resolution: int = 7
    scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 0
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left_feats, right_feats, proposals: StereoBoxes, batch_idx,
                 train: bool = False):
        lx = fpn_roi_align(
            left_feats, proposals.left, batch_idx, self.scales, self.resolution,
            self.sampling_ratio,
        )
        rx = fpn_roi_align(
            right_feats, proposals.right, batch_idx, self.scales, self.resolution,
            self.sampling_ratio,
        )
        x = jnp.concatenate([lx, rx], axis=-1)  # (N, r, r, 2C)
        x = nn.Conv(
            self.mlp_dim, (self.resolution, self.resolution),
            strides=(self.resolution, self.resolution), padding="VALID",
            dtype=self.dtype, name="rcnn_top0",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.mlp_dim, (1, 1), dtype=self.dtype, name="rcnn_top1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x.mean(axis=(1, 2))  # (N, mlp_dim)


class StereoBoxPredictor(nn.Module):
    num_classes: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 6, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


def subsample(
    key: jax.Array,
    proposals: StereoBoxes,
    gt_left: jnp.ndarray,  # (M, 4)
    gt_right: jnp.ndarray,  # (M, 4)
    gt_labels: jnp.ndarray,  # (M,) int
    gt_valid: jnp.ndarray,  # (M,)
    fg_iou: float = 0.5,
    bg_iou: float = 0.5,
    batch_size: int = 512,
    positive_fraction: float = 0.25,
):
    """Match proposals (with GT boxes appended by the caller) to targets.

    Returns (labels (P,), reg_targets (P, 6), pos_mask, sampled_mask,
    matched_gt (P,) int32).
    """
    prop_union = proposals.union()
    gt_union = jnp.concatenate(
        [jnp.minimum(gt_left[:, :2], gt_right[:, :2]), jnp.maximum(gt_left[:, 2:], gt_right[:, 2:])],
        axis=-1,
    )
    quality = pairwise_iou(gt_union, prop_union) * proposals.valid[None, :]
    m = match(quality, gt_valid, fg_iou, bg_iou, allow_low_quality=False)
    mi = jnp.maximum(m, 0)
    labels = jnp.where(m >= 0, gt_labels[mi], jnp.where(m == -1, 0, -1))
    labels = jnp.where(proposals.valid, labels, -1)
    gt6 = box_coder.join_stereo(gt_left, gt_right)[mi]
    reg_targets = box_coder.encode6(
        gt6, proposals.box6(), weights=(10.0, 10.0, 5.0, 5.0)
    )
    pos, neg = balanced_sample(key, labels, batch_size, positive_fraction)
    return labels, reg_targets, pos, pos | neg, mi


def head_loss(
    class_logits: jnp.ndarray,  # (P, C)
    box_deltas: jnp.ndarray,  # (P, C*6)
    labels: jnp.ndarray,  # (P,)
    reg_targets: jnp.ndarray,  # (P, 6)
    pos: jnp.ndarray,
    sampled: jnp.ndarray,
):
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    lbl = jnp.clip(labels, 0).astype(jnp.int32)
    ce = -jnp.take_along_axis(logp, lbl[:, None], axis=-1)[:, 0]
    n = jnp.maximum(jnp.sum(sampled), 1.0)
    cls_loss = jnp.sum(ce * sampled) / n
    d = box_deltas.reshape(box_deltas.shape[0], -1, 6)
    d_pos = jnp.take_along_axis(d, lbl[:, None, None], axis=1)[:, 0]
    box_loss = jnp.sum(smooth_l1(d_pos - reg_targets, beta=1.0) * pos[:, None]) / n
    return cls_loss, box_loss


def postprocess_batched(
    class_logits: jnp.ndarray,  # (B, P, C)
    box_deltas: jnp.ndarray,  # (B, P, C*6)
    proposals: StereoBoxes,  # leading batch axis (B, P, ...)
    image_hw: Tuple[int, int],
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
    max_out: int = 32,
) -> StereoBoxes:
    """Natively-batched `postprocess` (identical per-image outputs).

    jax.vmap over the per-image version lowers the `x[idx]` gathers to
    generic batched gathers that run ~5x slower on TPU (same pathology the
    SRPN postprocessor hit: ops/nms.py batched-variants note; measured
    2.47 ms of the 2D stage in box_postproc at P=300). take_along_axis +
    nms_topk_batched tile cleanly."""
    from ...ops.nms import nms_topk_batched

    bsz, p, num_classes = class_logits.shape
    probs = jax.nn.softmax(class_logits, axis=-1)
    d = box_deltas.reshape(bsz, p, num_classes, 6)
    left_d = d[..., (0, 1, 2, 3)].reshape(bsz * p, num_classes * 4)
    right_d = d[..., (4, 1, 5, 3)].reshape(bsz * p, num_classes * 4)
    w10 = (10.0, 10.0, 5.0, 5.0)
    left_all = box_coder.decode4(
        left_d, proposals.left.reshape(bsz * p, 4), weights=w10
    ).reshape(bsz, p, num_classes * 4)
    right_all = box_coder.decode4(
        right_d, proposals.right.reshape(bsz * p, 4), weights=w10
    ).reshape(bsz, p, num_classes * 4)
    h, w = image_hw
    lims = jnp.asarray([w - 1.0, h - 1.0, w - 1.0, h - 1.0])
    clip = lambda b: jnp.clip(b, jnp.zeros((4,)), lims)
    k = min(detections_per_img, max_out)
    outs = []
    for j in range(1, num_classes):
        lb = clip(left_all[:, :, j * 4 : (j + 1) * 4])
        rb = clip(right_all[:, :, j * 4 : (j + 1) * 4])
        sc = probs[:, :, j]
        ok = (sc > score_thresh) & proposals.valid
        idx, kept = nms_topk_batched(lb, sc, ok, nms_thresh, k)
        take = lambda x: jnp.take_along_axis(x, idx[..., None], axis=1)
        outs.append(
            StereoBoxes(
                left=take(lb), right=take(rb),
                score=jnp.take_along_axis(sc, idx, axis=1),
                valid=kept,
                fields={"labels": jnp.full(idx.shape, j, jnp.int32)},
            )
        )
    left = jnp.concatenate([o.left for o in outs], 1)
    right = jnp.concatenate([o.right for o in outs], 1)
    score = jnp.concatenate([o.score for o in outs], 1)
    valid = jnp.concatenate([o.valid for o in outs], 1)
    labels = jnp.concatenate([o.fields["labels"] for o in outs], 1)
    top, idx = jax.lax.top_k(jnp.where(valid, score, -1.0), max_out)
    take = lambda x: jnp.take_along_axis(x, idx[..., None], axis=1)
    return StereoBoxes(
        left=take(left), right=take(right),
        score=jnp.take_along_axis(score, idx, axis=1),
        valid=jnp.take_along_axis(valid, idx, axis=1) & (top > 0),
        fields={"labels": jnp.take_along_axis(labels, idx, axis=1)},
    )


def postprocess(
    class_logits: jnp.ndarray,  # (P, C)
    box_deltas: jnp.ndarray,  # (P, C*6)
    proposals: StereoBoxes,
    image_hw: Tuple[int, int],
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
    max_out: int = 32,
) -> StereoBoxes:
    """Single-image double-view postprocess -> StereoBoxes(max_out) with
    'labels' field. Per class >=1: threshold, decode, clip, LEFT-box NMS."""
    num_classes = class_logits.shape[-1]
    probs = jax.nn.softmax(class_logits, axis=-1)
    d = box_deltas.reshape(-1, num_classes, 6)
    left_d = d[..., (0, 1, 2, 3)].reshape(-1, num_classes * 4)
    right_d = d[..., (4, 1, 5, 3)].reshape(-1, num_classes * 4)
    left_all = box_coder.decode4(left_d, proposals.left, weights=(10.0, 10.0, 5.0, 5.0))
    right_all = box_coder.decode4(right_d, proposals.right, weights=(10.0, 10.0, 5.0, 5.0))
    h, w = image_hw
    clip = lambda b: jnp.clip(
        b, jnp.asarray([0.0, 0.0, 0.0, 0.0]), jnp.asarray([w - 1.0, h - 1.0, w - 1.0, h - 1.0])
    )
    outs = []
    for j in range(1, num_classes):
        lb = clip(left_all[:, j * 4 : (j + 1) * 4])
        rb = clip(right_all[:, j * 4 : (j + 1) * 4])
        sc = probs[:, j]
        ok = (sc > score_thresh) & proposals.valid
        idx, kept = nms_topk(lb, sc, ok, nms_thresh, min(detections_per_img, max_out))
        outs.append(
            StereoBoxes(
                left=lb[idx],
                right=rb[idx],
                score=sc[idx],
                valid=kept,
                fields={"labels": jnp.full(idx.shape, j, jnp.int32)},
            )
        )
    # concat classes, keep global top max_out by score
    left = jnp.concatenate([o.left for o in outs], 0)
    right = jnp.concatenate([o.right for o in outs], 0)
    score = jnp.concatenate([o.score for o in outs], 0)
    valid = jnp.concatenate([o.valid for o in outs], 0)
    labels = jnp.concatenate([o.fields["labels"] for o in outs], 0)
    top, idx = jax.lax.top_k(jnp.where(valid, score, -1.0), max_out)
    return StereoBoxes(
        left=left[idx],
        right=right[idx],
        score=score[idx],
        valid=valid[idx] & (top > 0),
        fields={"labels": labels[idx]},
    )
