"""Stereo RPN: joint left/right objectness + 6-param box regression.

TPU-native reformulation of the reference StereoRPN
(modeling/rpn/stereo_rpn/srpn.py:14-137, inference.py:124-202, loss.py:21-172):
- SRPNHead: one shared 3x3 conv tower applied to both views, concat -> 1x1
  cls (A*2, 2-way softmax) and 1x1 bbox (A*6) heads, per FPN level.
- Postprocess: flatten all levels, decode 6-param deltas against anchors,
  split L/R (shared y), clip, min-size filter, double-view NMS via the O(k*N)
  select-and-suppress loop -> fixed post_nms_top_n proposals + validity mask.
- Loss: anchors matched to the UNION of each GT pair (0.7/0.3, low-quality
  recovery), balanced 256@0.5 sampling, 2-way cross-entropy + smooth-L1
  (beta=1/9) on the 6-dim targets of sampled positives, normalized by the
  number of sampled anchors.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pairwise_iou
from ...ops.losses import smooth_l1
from ...ops.nms import double_view_nms_topk, double_view_nms_topk_batched
from ...ops.topk_select import topk_scores
from ...structures.stereo import StereoBoxes
from . import box_coder
from .matcher import balanced_sample, match


def _use_atlas() -> bool:
    """DISPRCNN_SRPN_ATLAS=1: run the SRPN head's convs over one packed
    level atlas (see SRPNHead.__call__). Bit-identical; default off until
    the on-chip A/B flips it. Read at trace time."""
    import os

    return os.environ.get("DISPRCNN_SRPN_ATLAS", "0") == "1"


class SRPNHead(nn.Module):
    """Shared-conv stereo RPN head (reference srpn.py:14-51).

    The reference has a quirk chain: an IN-HEAD softmax over a (B, 2, A*H, W)
    VIEW of the (B, A*2, H, W) logits (srpn.py:47) — pairing channels
    (c, c+A), i.e. PLANAR class layout — while both its loss
    (concat_box_prediction_layers) and its postprocessor then read the
    softmaxed tensor INTERLEAVED as (anchor, 2), and the loss applies
    cross_entropy on the already-softmaxed values (double softmax).
    Default mode here is the clean equivalent (raw interleaved logits, one
    softmax at the consumer) — self-consistent for training from scratch;
    `quirk_exact=True` (cfg TPU.SRPN_QUIRK_EXACT) reproduces the reference
    chain verbatim for released-checkpoint bit-parity (parity-tested against
    the vendored torch source in tests/test_srpn_quirk_parity.py)."""

    in_channels: int = 256
    num_anchors: int = 3
    # QUIRK-EXACT mode (released-checkpoint bit-parity): reproduce the
    # reference chain verbatim — in-head softmax over the PLANAR (2, A)
    # channel view (srpn.py:47, pairing channel c with c+A), output then read
    # INTERLEAVED by loss/postproc. The emitted (..., A, 2) values are
    # probabilities-misread-as-logits: the loss's log_softmax on them IS the
    # reference's double softmax, and the postprocessor must rank by
    # values[..., 1] directly (scores_are_probs=True), like the reference's
    # commented-out sigmoid (inference.py:84-85).
    quirk_exact: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        left_feats: Sequence[jnp.ndarray],
        right_feats: Sequence[jnp.ndarray],
        both_feats: Optional[Sequence[jnp.ndarray]] = None,
    ):
        """-> list per level of (obj_logits (B,H,W,A,2), deltas (B,H,W,A,6)).

        When `both_feats` (the concat-batch (2B, H, W, C) backbone outputs)
        is given, the shared 3x3 conv runs on it DIRECTLY and the views are
        split afterwards — identical math (the conv is shared across views),
        but the conv keeps the backbone's output layout. Slicing the batch
        first makes XLA pick a degenerate layout for the B=1 conv: measured
        5.4 ms vs ~1.4 ms for the same FLOPs (DispRCNN/rpn_head/conv).
        """
        conv = nn.Conv(
            self.in_channels * 2, (3, 3), padding="SAME", dtype=self.dtype, name="conv"
        )
        cls = nn.Conv(self.num_anchors * 2, (1, 1), dtype=self.dtype, name="cls_logits")
        box = nn.Conv(self.num_anchors * 6, (1, 1), dtype=self.dtype, name="bbox_pred")
        def read_cls(raw):
            """(B, H, W, 2A) channel vector -> (B, H, W, A, 2).

            Clean mode: interleaved reshape (channel 2a+cls = anchor a).
            Quirk mode: planar-pair softmax first (channel c with c+A,
            srpn.py:47), THEN the interleaved read — reference verbatim."""
            b, h, w, _ = raw.shape
            a = self.num_anchors
            if self.quirk_exact:
                planar = raw.reshape(b, h, w, 2, a)
                raw = jax.nn.softmax(planar, axis=-2).reshape(b, h, w, 2 * a)
            return raw.reshape(b, h, w, a, 2)

        outs = []
        if both_feats is not None and len(both_feats) > 1 and _use_atlas():
            # LEVEL ATLAS: pack all FPN levels into one (2B, Htot, Wmax, C)
            # canvas with 2 zero rows between levels and zero-padded
            # columns, so the shared 3x3 conv + both 1x1 heads run as ONE
            # call each instead of 3 per level (15 -> 3; the small levels'
            # convs are lane/tile-starved standalone). Exact same TERMS:
            # a 3x3 window never reaches past a 2-row gap, and every
            # gap/pad contribution is an exact zero product — identical
            # to each level's own SAME zero padding (the conv's internal
            # accumulation order may differ with the shape: ULP-level).
            hws = [(f.shape[1], f.shape[2]) for f in both_feats]
            wmax = max(w_ for _, w_ in hws)
            nl = len(both_feats)
            parts = []
            for i, f in enumerate(both_feats):
                h_l, w_l = hws[i]
                parts.append(jnp.pad(
                    f, ((0, 0), (0, 2 if i < nl - 1 else 0),
                        (0, wmax - w_l), (0, 0))))
            atlas = jnp.concatenate(parts, axis=1)
            b2 = atlas.shape[0]
            t2 = nn.relu(conv(atlas))
            t = jnp.concatenate([t2[: b2 // 2], t2[b2 // 2 :]], axis=-1)
            cls_a = cls(t)
            box_a = box(t)
            off = 0
            for h_l, w_l in hws:
                cl_ = cls_a[:, off : off + h_l, :w_l]
                bx = box_a[:, off : off + h_l, :w_l]
                b = cl_.shape[0]
                logits = read_cls(cl_)
                deltas = bx.reshape(b, h_l, w_l, self.num_anchors, 6)
                outs.append((logits, deltas))
                off += h_l + 2
            return outs
        if both_feats is not None:
            for f2 in both_feats:
                b2 = f2.shape[0]
                t2 = nn.relu(conv(f2))
                t = jnp.concatenate([t2[: b2 // 2], t2[b2 // 2 :]], axis=-1)
                b, h, w, _ = t.shape
                logits = read_cls(cls(t))
                deltas = box(t).reshape(b, h, w, self.num_anchors, 6)
                outs.append((logits, deltas))
            return outs
        for lf, rf in zip(left_feats, right_feats):
            lt = nn.relu(conv(lf))
            rt = nn.relu(conv(rf))
            t = jnp.concatenate([lt, rt], axis=-1)
            b, h, w, _ = t.shape
            logits = read_cls(cls(t))
            deltas = box(t).reshape(b, h, w, self.num_anchors, 6)
            outs.append((logits, deltas))
        return outs


def flatten_levels(head_outs) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concat per-level outputs -> (B, N_tot, 2) logits, (B, N_tot, 6) deltas
    in (level, H, W, A) anchor order."""
    logits = jnp.concatenate(
        [o[0].reshape(o[0].shape[0], -1, 2) for o in head_outs], axis=1
    )
    deltas = jnp.concatenate(
        [o[1].reshape(o[1].shape[0], -1, 6) for o in head_outs], axis=1
    )
    return logits, deltas


def postprocess(
    anchors: jnp.ndarray,  # (N_tot, 4)
    obj_logits: jnp.ndarray,  # (N_tot, 2) — single image
    deltas: jnp.ndarray,  # (N_tot, 6)
    image_hw: Tuple[int, int],
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
    scores_are_probs: bool = False,  # quirk-exact head: rank raw [..., 1]
) -> StereoBoxes:
    """Single-image SRPN proposal selection -> StereoBoxes(post_nms_top_n)."""
    scores = obj_logits[:, 1] if scores_are_probs else jax.nn.softmax(obj_logits, axis=-1)[:, 1]
    k = min(pre_nms_top_n, anchors.shape[0])
    # softmax probs are non-negative: threshold-select avoids the full
    # N~119k sort lax.top_k lowers to on TPU (ops/topk_select.py)
    top_scores, top_idx = topk_scores(scores[None], k)
    top_scores, top_idx = top_scores[0], top_idx[0]
    box6 = box_coder.decode6(deltas[top_idx], anchors[top_idx])
    left, right = box_coder.split_stereo(box6)
    h, w = image_hw
    clip = lambda b: jnp.stack(
        [
            jnp.clip(b[:, 0], 0, w - 1),
            jnp.clip(b[:, 1], 0, h - 1),
            jnp.clip(b[:, 2], 0, w - 1),
            jnp.clip(b[:, 3], 0, h - 1),
        ],
        axis=-1,
    )
    left, right = clip(left), clip(right)
    big = lambda b: (b[:, 2] - b[:, 0] >= min_size) & (b[:, 3] - b[:, 1] >= min_size)
    valid = big(left) & big(right)
    idx, ok = double_view_nms_topk(
        left, right, top_scores, valid, nms_thresh, post_nms_top_n
    )
    return StereoBoxes(
        left=left[idx], right=right[idx], score=top_scores[idx], valid=ok
    )


def postprocess_batched(
    anchors: jnp.ndarray,  # (N_tot, 4)
    obj_logits: jnp.ndarray,  # (B, N_tot, 2)
    deltas: jnp.ndarray,  # (B, N_tot, 6)
    image_hw: Tuple[int, int],
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
    scores_are_probs: bool = False,  # quirk-exact head: rank raw [..., 1]
) -> StereoBoxes:
    """Natively-batched `postprocess` (identical per-image outputs).

    jax.vmap over the per-image version turns `x[idx]` gathers into generic
    batched gathers that run ~5x slower on TPU (13.9 -> 2.7 ms at N=6000);
    this spells them as take_along_axis and uses the batched NMS."""
    bsz = obj_logits.shape[0]
    scores = (obj_logits[..., 1] if scores_are_probs
              else jax.nn.softmax(obj_logits, axis=-1)[..., 1])  # (B, N)
    k = min(pre_nms_top_n, anchors.shape[0])
    # softmax probs are non-negative: threshold-select avoids the full
    # N~119k sort lax.top_k lowers to on TPU (ops/topk_select.py)
    top_scores, top_idx = topk_scores(scores, k)  # (B, k)
    d = jnp.take_along_axis(deltas, top_idx[..., None], axis=1)
    a = jnp.take(anchors, top_idx, axis=0)  # (B, k, 4)
    box6 = box_coder.decode6(d.reshape(-1, 6), a.reshape(-1, 4))
    left, right = box_coder.split_stereo(box6)
    left = left.reshape(bsz, k, 4)
    right = right.reshape(bsz, k, 4)
    h, w = image_hw
    lims = jnp.asarray([w - 1.0, h - 1.0, w - 1.0, h - 1.0])
    clip = lambda b: jnp.clip(b, jnp.zeros((4,)), lims)
    left, right = clip(left), clip(right)
    big = lambda b: (b[..., 2] - b[..., 0] >= min_size) & (b[..., 3] - b[..., 1] >= min_size)
    valid = big(left) & big(right)
    # top_k already returned score-descending rows: skip the NMS argsort
    idx, ok = double_view_nms_topk_batched(
        left, right, top_scores, valid, nms_thresh, post_nms_top_n,
        presorted=True,
    )
    take3 = lambda x: jnp.take_along_axis(x, idx[..., None], axis=1)
    return StereoBoxes(
        left=take3(left), right=take3(right),
        score=jnp.take_along_axis(top_scores, idx, axis=1), valid=ok,
    )


def loss(
    key: jax.Array,
    anchors: jnp.ndarray,  # (N, 4)
    visibility: jnp.ndarray,  # (N,) bool
    obj_logits: jnp.ndarray,  # (B, N, 2)
    deltas: jnp.ndarray,  # (B, N, 6)
    gt_left: jnp.ndarray,  # (B, M, 4)
    gt_right: jnp.ndarray,  # (B, M, 4)
    gt_valid: jnp.ndarray,  # (B, M) bool
    fg_iou: float = 0.7,
    bg_iou: float = 0.3,
    batch_per_image: int = 256,
    positive_fraction: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch SRPN loss -> (objectness_loss, box_loss)."""

    def per_image(k, logit, delta, gl, gr, gv):
        union = jnp.concatenate(
            [jnp.minimum(gl[:, :2], gr[:, :2]), jnp.maximum(gl[:, 2:], gr[:, 2:])], -1
        )
        quality = pairwise_iou(union, anchors)  # (M, N)
        m = match(quality, gv, fg_iou, bg_iou, allow_low_quality=True)
        labels = jnp.where(m >= 0, 1.0, jnp.where(m == -1, 0.0, -1.0))
        labels = jnp.where(visibility, labels, -1.0)
        pos, neg = balanced_sample(k, labels, batch_per_image, positive_fraction)
        sampled = pos | neg

        gt6 = box_coder.join_stereo(gl, gr)[jnp.maximum(m, 0)]
        reg_targets = box_coder.encode6(gt6, anchors)
        box_l = jnp.sum(
            smooth_l1(delta - reg_targets, beta=1.0 / 9) * pos[:, None]
        )
        logp = jax.nn.log_softmax(logit, axis=-1)
        lbl = jnp.clip(labels, 0).astype(jnp.int32)
        ce = -jnp.take_along_axis(logp, lbl[:, None], axis=-1)[:, 0]
        obj_l = jnp.sum(ce * sampled)
        return obj_l, box_l, jnp.sum(sampled)

    keys = jax.random.split(key, obj_logits.shape[0])
    obj_l, box_l, cnt = jax.vmap(per_image)(
        keys, obj_logits, deltas, gt_left, gt_right, gt_valid
    )
    total = jnp.maximum(jnp.sum(cnt), 1.0)
    # reference normalizes box loss by sampled count per batch and CE as a mean
    return jnp.sum(obj_l) / total, jnp.sum(box_l) / total
