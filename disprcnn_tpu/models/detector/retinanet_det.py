"""RetinaNet meta-architecture (single-stage, single-view).

Reference: modeling/rpn/retinanet/retinanet.py:13-152 composed through
modeling/detector/generalized_rcnn.py with MODEL.RETINANET_ON=True and
MODEL.RPN_ONLY=True — backbone (R-x-FPN with LastLevelP6P7, P3-P7) ->
RetinaNetHead -> focal loss (train) / per-level top-k + NMS (eval).

TPU notes: fixed-shape postprocess (padded top-k + masked NMS); the
per-level anchor grids are concatenated once outside the head so the
whole eval path is one jit region.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbone.fpn import ResNetFPNBackbone
from ..rpn import retinanet as rn


class RetinaNetDetector(nn.Module):
    body: str = "R-50"
    out_channels: int = 256
    freeze_at: int = 2
    num_classes: int = 80  # foreground classes (reference C-1)
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    octave: float = 2.0
    scales_per_octave: int = 3
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    loss_gamma: float = 2.0
    loss_alpha: float = 0.25
    pre_nms_top_n: int = 1000
    score_thresh: float = 0.05
    nms_thresh: float = 0.4
    max_det: int = 100
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        train: bool = False,
        gt_boxes=None,
        gt_labels=None,
        gt_valid=None,
    ):
        b, img_h, img_w, _ = images.shape
        feats = ResNetFPNBackbone(
            body=self.body, out_channels=self.out_channels,
            freeze_at=self.freeze_at, use_gn_body=self.use_gn,
            top_blocks="p6p7", skip_c2=True, dtype=self.dtype, name="backbone",
        )(images)  # P3..P7

        gen = rn.octave_anchor_generator(
            sizes=self.anchor_sizes, strides=self.anchor_strides,
            ratios=self.aspect_ratios, octave=self.octave,
            scales_per_octave=self.scales_per_octave,
        )
        anchors_np, _vis = gen((img_h, img_w), [f.shape[1:3] for f in feats])
        anchors = jnp.asarray(anchors_np)

        head_outs = rn.RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=len(self.aspect_ratios) * self.scales_per_octave,
            dtype=self.dtype, name="head",
        )(feats)
        cls_logits = jnp.concatenate([o[0] for o in head_outs], axis=1)
        box_deltas = jnp.concatenate([o[1] for o in head_outs], axis=1)

        if train:
            key = self.make_rng("sampling")
            cls_l, box_l = rn.retinanet_loss(
                key, anchors, cls_logits.astype(jnp.float32),
                box_deltas.astype(jnp.float32), gt_boxes, gt_labels, gt_valid,
                fg_iou=self.fg_iou, bg_iou=self.bg_iou,
                gamma=self.loss_gamma, alpha=self.loss_alpha,
            )
            return {"loss_retina_cls": cls_l, "loss_retina_reg": box_l}

        dets = jax.vmap(
            lambda cl, bd: rn.retinanet_postprocess(
                anchors, cl.astype(jnp.float32), bd.astype(jnp.float32),
                (img_h, img_w), self.pre_nms_top_n, self.score_thresh,
                self.nms_thresh, self.max_det,
            )
        )(cls_logits, box_deltas)
        return {"detections": dets}
