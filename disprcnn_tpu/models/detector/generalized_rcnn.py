"""GeneralizedRCNN: mono (single-view) Mask R-CNN meta-architecture.

Reference: modeling/detector/generalized_rcnn.py — backbone -> RPN ->
box head (+ optional mask head) on ONE view. Kept for META_ARCHITECTURE
registry parity with the reference (STEREO_ON=False path); shares the
backbone / pooler / mask-head modules with DispRCNN.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.losses import smooth_l1
from ...ops.nms import nms_topk
from ...ops import pairwise_iou
from ...structures.boxes import Boxes2D
from ..backbone.fpn import ResNetFPNBackbone
from ..roi_heads import mask_head as mh
from ..roi_heads.pooler import fpn_roi_align
from ..rpn import box_coder, rpn
from ..rpn.anchors import AnchorGenerator
from ..rpn.matcher import balanced_sample, match


class MonoBoxHead(nn.Module):
    """FPN2MLPFeatureExtractor + FPNPredictor (reference
    roi_box_feature_extractors.py FPN2MLP / roi_box_predictors.FPNPredictor)."""

    num_classes: int = 81
    mlp_dim: int = 1024
    resolution: int = 7
    scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, batch_idx):
        x = fpn_roi_align(
            feats, boxes, batch_idx, self.scales, self.resolution, self.sampling_ratio
        )
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc7")(x))
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class C4BoxHead(nn.Module):
    """ResNet50Conv5ROIFeatureExtractor + FastRCNNPredictor (reference
    roi_box_feature_extractors.py:16-44, roi_box_predictors.py:7-28 — the
    C4-body box-head path): 14x14 ROIAlign on the single C4 map, res5 stage
    (stride 2 -> 7x7x2048), global average pool, linear cls/box heads."""

    body: str = "R-50"
    num_classes: int = 81
    resolution: int = 14
    scale: float = 1.0 / 16.0
    sampling_ratio: int = 0
    use_gn: bool = False
    fbnet_scale_factor: float = 1.0
    fbnet_width_divisor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_c4, boxes, batch_idx):
        from ..backbone.resnet import Stage5Head
        from ...ops.roi_align import roi_align_batched

        x = roi_align_batched(
            feat_c4, boxes, batch_idx, self.resolution,
            spatial_scale=self.scale, sampling_ratio=self.sampling_ratio,
            rois_per_image=(boxes.shape[0] // feat_c4.shape[0]
                            if boxes.shape[0] % feat_c4.shape[0] == 0
                            else None),
        )
        x = Stage5Head(
            body=self.body, use_gn=self.use_gn, dtype=self.dtype, name="head"
        )(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class GeneralizedRCNN(nn.Module):
    body: str = "R-50"
    out_channels: int = 256
    freeze_at: int = 2
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 1000
    post_nms_top_n_test: int = 300
    rpn_nms_thresh: float = 0.7
    num_classes: int = 81
    mlp_head_dim: int = 1024
    roi_batch_per_image: int = 512
    score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    max_det: int = 32
    max_gt: int = 32
    mask_on: bool = False
    use_gn: bool = False
    fbnet_scale_factor: float = 1.0
    fbnet_width_divisor: int = 1
    dtype: Any = jnp.float32

    @property
    def _c4_mode(self) -> bool:
        return self.body.endswith(("-C4", "-C5"))

    def _run_box_head(self, feats, boxes, batch_idx):
        if self._c4_mode:
            return C4BoxHead(
                body=self.body, num_classes=self.num_classes,
                scale=1.0 / 16.0 if self.body.endswith("-C4") else 1.0 / 32.0,
                use_gn=self.use_gn, dtype=self.dtype, name="box_head",
            )(feats[0], boxes, batch_idx)
        return MonoBoxHead(
            num_classes=self.num_classes, mlp_dim=self.mlp_head_dim,
            dtype=self.dtype, name="box_head",
        )(feats[:-1], boxes, batch_idx)

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        train: bool = False,
        gt_boxes: Optional[jnp.ndarray] = None,
        gt_labels: Optional[jnp.ndarray] = None,
        gt_valid: Optional[jnp.ndarray] = None,
        gt_masks: Optional[jnp.ndarray] = None,
    ):
        b, img_h, img_w, _ = images.shape
        if self._c4_mode:
            # single-map body: stem + res2..res4 (C4, stride 16) or res5 (C5,
            # stride 32); reference modeling/backbone/backbone.py:16-34
            from ..backbone.resnet import ResNet

            n_stages = 3 if self.body.endswith("-C4") else 4
            cs = ResNet(
                body=self.body, num_stages=n_stages, freeze_at=self.freeze_at,
                use_gn=self.use_gn, dtype=self.dtype, name="backbone",
            )(images)
            feats = (cs[-1],)
            stride = 16 if n_stages == 3 else 32
            gen = AnchorGenerator(self.anchor_sizes, (stride,), self.aspect_ratios)
        else:
            feats = ResNetFPNBackbone(
                body=self.body, out_channels=self.out_channels,
                freeze_at=self.freeze_at, use_gn_body=self.use_gn,
                use_gn_fpn=self.use_gn,
                fbnet_scale_factor=self.fbnet_scale_factor,
                fbnet_width_divisor=self.fbnet_width_divisor,
                dtype=self.dtype, name="backbone",
            )(images)
            gen = AnchorGenerator(self.anchor_sizes, self.anchor_strides, self.aspect_ratios)
        anchors_np, vis_np = gen((img_h, img_w), [f.shape[1:3] for f in feats])
        anchors, vis = jnp.asarray(anchors_np), jnp.asarray(vis_np)

        head_outs = rpn.RPNHead(
            in_channels=int(feats[0].shape[-1]),
            num_anchors=gen.num_anchors_per_location,
            dtype=self.dtype, name="rpn_head",
        )(feats)
        logits, deltas = rpn.flatten_levels(head_outs)

        out = {}
        pre = self.pre_nms_top_n_train if train else self.pre_nms_top_n_test
        post = self.post_nms_top_n_train if train else self.post_nms_top_n_test
        proposals = jax.vmap(
            lambda o, d: rpn.postprocess(
                anchors, o, d, (img_h, img_w), pre, post, self.rpn_nms_thresh, 0.0
            )
        )(logits, deltas)

        if train:
            k = self.make_rng("sampling")
            out["loss_objectness"], out["loss_rpn_box_reg"] = rpn.loss(
                k, anchors, vis, logits, deltas, gt_boxes, gt_valid
            )
            # match + subsample (single-view FastRCNN loss path)
            keys = jax.random.split(self.make_rng("sampling"), b)

            def sub(kk, p, g, gl, gv):
                quality = pairwise_iou(g, p.xyxy) * p.valid[None, :]
                m = match(quality, gv, 0.5, 0.5, allow_low_quality=False)
                mi = jnp.maximum(m, 0)
                labels = jnp.where(m >= 0, gl[mi], jnp.where(m == -1, 0, -1))
                labels = jnp.where(p.valid, labels, -1)
                regt = box_coder.encode4(g[mi], p.xyxy, weights=(10.0, 10.0, 5.0, 5.0))
                pos, neg = balanced_sample(kk, labels, self.roi_batch_per_image, 0.25)
                return labels, regt, pos, pos | neg

            labels, regt, pos, sampled = jax.vmap(sub)(
                keys, proposals, gt_boxes, gt_labels, gt_valid
            )
            p = proposals.xyxy.shape[1]
            flat = lambda x: x.reshape((b * p,) + x.shape[2:])
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
            scores, box_deltas = self._run_box_head(
                feats, flat(proposals.xyxy), batch_idx
            )
            lbl = jnp.clip(flat(labels), 0).astype(jnp.int32)
            logp = jax.nn.log_softmax(scores, -1)
            ce = -jnp.take_along_axis(logp, lbl[:, None], -1)[:, 0]
            n = jnp.maximum(flat(sampled).sum(), 1.0)
            out["loss_classifier"] = jnp.sum(ce * flat(sampled)) / n
            d = box_deltas.reshape(box_deltas.shape[0], -1, 4)
            d_pos = jnp.take_along_axis(d, lbl[:, None, None], 1)[:, 0]
            out["loss_box_reg"] = (
                jnp.sum(smooth_l1(d_pos - flat(regt)) * flat(pos)[:, None]) / n
            )
            return out

        p = proposals.xyxy.shape[1]
        flat = lambda x: x.reshape((b * p,) + x.shape[2:])
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        scores, box_deltas = self._run_box_head(
            feats, flat(proposals.xyxy), batch_idx
        )

        def post_img(sc, bd, prop):
            probs = jax.nn.softmax(sc, -1)
            boxes_all = box_coder.decode4(bd, prop.xyxy, weights=(10.0, 10.0, 5.0, 5.0))
            outs = []
            for j in range(1, self.num_classes):
                bj = jnp.clip(
                    boxes_all[:, j * 4 : (j + 1) * 4],
                    jnp.zeros(4),
                    jnp.asarray([img_w - 1.0, img_h - 1.0, img_w - 1.0, img_h - 1.0]),
                )
                sj = probs[:, j]
                ok = (sj > self.score_thresh) & prop.valid
                idx, kept = nms_topk(bj, sj, ok, self.box_nms_thresh, self.max_det)
                outs.append((bj[idx], sj[idx], kept, jnp.full(idx.shape, j, jnp.int32)))
            boxes = jnp.concatenate([o[0] for o in outs], 0)
            sc2 = jnp.concatenate([o[1] for o in outs], 0)
            ok2 = jnp.concatenate([o[2] for o in outs], 0)
            lb2 = jnp.concatenate([o[3] for o in outs], 0)
            top, idx = jax.lax.top_k(jnp.where(ok2, sc2, -1.0), self.max_det)
            return Boxes2D(
                xyxy=boxes[idx], valid=ok2[idx] & (top > 0), size=(img_w, img_h),
                fields={"scores": sc2[idx], "labels": lb2[idx]},
            )

        dets = jax.vmap(post_img)(
            scores.reshape(b, p, -1), box_deltas.reshape(b, p, -1), proposals
        )
        out["detections"] = dets
        if self.mask_on and self._c4_mode:
            raise NotImplementedError(
                "C4 mask head (shared res5 extractor) not supported; use an "
                "FPN body for MASK_ON (reference MaskRCNNC4Predictor)"
            )
        if self.mask_on:
            det_flat = dets.xyxy.reshape(b * self.max_det, 4)
            det_bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), self.max_det)
            ml = mh.MaskHead(
                num_classes=self.num_classes, dtype=self.dtype, name="mask_head"
            )(feats[:-1], det_flat, det_bi)
            probs = mh.mask_probs(ml, dets.fields["labels"].reshape(-1))
            out["masks"] = probs.reshape(b, self.max_det, *probs.shape[1:])
        return out
