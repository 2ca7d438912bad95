"""Single-view RPN (mono path, reference modeling/rpn/rpn.py:15-209).

Used when STEREO_ON=False (GeneralizedRCNN): shared 3x3 conv + 1x1 objectness
(A channels, sigmoid) + 1x1 box regression (A*4). Fixed-shape postprocessing
and loss mirror the stereo variants with the 4-parameter codec.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pairwise_iou
from ...ops.losses import smooth_l1
from ...ops.topk_select import topk_scores
from ...ops.nms import nms_topk
from ...structures.boxes import Boxes2D
from . import box_coder
from .matcher import balanced_sample, match


class RPNHead(nn.Module):
    in_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.in_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        box = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        outs = []
        for f in feats:
            t = nn.relu(conv(f))
            b, h, w, _ = t.shape
            outs.append(
                (
                    cls(t).reshape(b, h, w, self.num_anchors),
                    box(t).reshape(b, h, w, self.num_anchors, 4),
                )
            )
        return outs


def flatten_levels(head_outs):
    logits = jnp.concatenate([o[0].reshape(o[0].shape[0], -1) for o in head_outs], 1)
    deltas = jnp.concatenate(
        [o[1].reshape(o[1].shape[0], -1, 4) for o in head_outs], 1
    )
    return logits, deltas


def postprocess(
    anchors: jnp.ndarray,
    obj_logits: jnp.ndarray,  # (N,) single image
    deltas: jnp.ndarray,  # (N, 4)
    image_hw: Tuple[int, int],
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
) -> Boxes2D:
    scores = jax.nn.sigmoid(obj_logits)
    k = min(pre_nms_top_n, anchors.shape[0])
    # sigmoid probs are non-negative: threshold-select avoids the full
    # sort lax.top_k lowers to on TPU (ops/topk_select.py)
    top_s, top_i = topk_scores(scores[None], k)
    top_s, top_i = top_s[0], top_i[0]
    boxes = box_coder.decode4(deltas[top_i], anchors[top_i])
    h, w = image_hw
    boxes = jnp.clip(
        boxes, jnp.zeros(4), jnp.asarray([w - 1.0, h - 1.0, w - 1.0, h - 1.0])
    )
    big = (boxes[:, 2] - boxes[:, 0] >= min_size) & (boxes[:, 3] - boxes[:, 1] >= min_size)
    idx, ok = nms_topk(boxes, top_s, big, nms_thresh, min(post_nms_top_n, k))
    return Boxes2D(
        xyxy=boxes[idx], valid=ok, size=(w, h), fields={"objectness": top_s[idx]}
    )


def loss(
    key: jax.Array,
    anchors: jnp.ndarray,
    visibility: jnp.ndarray,
    obj_logits: jnp.ndarray,  # (B, N)
    deltas: jnp.ndarray,  # (B, N, 4)
    gt: jnp.ndarray,  # (B, M, 4)
    gt_valid: jnp.ndarray,
    fg_iou: float = 0.7,
    bg_iou: float = 0.3,
    batch_per_image: int = 256,
    positive_fraction: float = 0.5,
):
    def per_image(k, logit, delta, g, gv):
        quality = pairwise_iou(g, anchors)
        m = match(quality, gv, fg_iou, bg_iou, allow_low_quality=True)
        labels = jnp.where(m >= 0, 1.0, jnp.where(m == -1, 0.0, -1.0))
        labels = jnp.where(visibility, labels, -1.0)
        pos, neg = balanced_sample(k, labels, batch_per_image, positive_fraction)
        sampled = pos | neg
        reg_targets = box_coder.encode4(g[jnp.maximum(m, 0)], anchors)
        box_l = jnp.sum(smooth_l1(delta - reg_targets, beta=1.0 / 9) * pos[:, None])
        p = jax.nn.sigmoid(logit)
        t = jnp.clip(labels, 0)
        bce = -(t * jnp.log(jnp.clip(p, 1e-12)) + (1 - t) * jnp.log(jnp.clip(1 - p, 1e-12)))
        return jnp.sum(bce * sampled), box_l, jnp.sum(sampled)

    keys = jax.random.split(key, obj_logits.shape[0])
    obj_l, box_l, cnt = jax.vmap(per_image)(keys, obj_logits, deltas, gt, gt_valid)
    total = jnp.maximum(jnp.sum(cnt), 1.0)
    return jnp.sum(obj_l) / total, jnp.sum(box_l) / total
