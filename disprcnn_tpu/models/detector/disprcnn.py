"""DispRCNN 2D stereo detector meta-architecture.

Reference: modeling/detector/disprcnn.py:93-160. Left+right images are
concatenated along batch for ONE backbone pass (disprcnn.py:121-125 — exactly
the right TPU formulation: double batch, one conv net), features split per
view, then Stereo RPN -> stereo box head -> mask head (left view).

Fixed-shape contracts:
- GT arrives padded to (B, MAX_GT, ...) with validity masks.
- Train: proposals = post_nms_top_n + MAX_GT rows, subsampled and
  gather-compacted to ROI_BATCH rows before pooling (so pooling cost is
  512 ROIs, not 2000 — the reference subsamples before pooling too).
- Eval: post_nms proposals pooled directly; detections padded to MAX_DET.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...structures.stereo import StereoBoxes
from ..backbone.fpn import ResNetFPNBackbone
from ..roi_heads import box_head as bh
from ..roi_heads import mask_head as mh
from ..rpn import stereo_rpn
from ..rpn.anchors import AnchorGenerator


class DispRCNN(nn.Module):
    # backbone
    body: str = "R-101"
    out_channels: int = 256
    freeze_at: int = 2
    # anchors / rpn
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    straddle_thresh: float = 0.0
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 6000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 300
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    # box head
    num_classes: int = 2
    mlp_head_dim: int = 2048
    box_resolution: int = 7
    box_sampling_ratio: int = 0
    pooler_scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    roi_batch_per_image: int = 512
    roi_positive_fraction: float = 0.25
    roi_fg_iou: float = 0.5
    roi_bg_iou: float = 0.5
    score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    detections_per_img: int = 100
    max_det: int = 32
    max_gt: int = 32
    # mask head
    mask_on: bool = True
    mask_resolution: int = 14
    mask_sampling_ratio: int = 2
    # in-framework iDispNet on FPN ROI features (MODEL.DISPNET_ON)
    dispnet_on: bool = False
    dispnet_maxdisp: int = 48
    dispnet_mindisp: int = -48
    dispnet_resolution: int = 28
    dispnet_disp_resolution: int = 112
    dispnet_conv_layers: Tuple[int, ...] = (256,)
    dispnet_loss_weight: float = 1.0
    # backbone norm (MODEL.BACKBONE.USE_GN / MODEL.FPN.USE_GN)
    use_gn: bool = False
    use_gn_fpn: bool = False
    # MODEL.FBNET.* (CONV_BODY FBNet* bodies)
    fbnet_scale_factor: float = 1.0
    fbnet_width_divisor: int = 1
    fbnet_dw_skip_bn: bool = True
    fbnet_dw_skip_relu: bool = True
    # TPU.SRPN_QUIRK_EXACT: replicate the reference SRPN planar-softmax /
    # interleaved-read / double-softmax chain (required for bit-parity with
    # released 2D checkpoints; see stereo_rpn.SRPNHead docstring)
    srpn_quirk_exact: bool = False
    # dtype policy
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        left: jnp.ndarray,  # (B, H, W, 3) normalized
        right: jnp.ndarray,
        train: bool = False,
        gt_left: Optional[jnp.ndarray] = None,  # (B, M, 4)
        gt_right: Optional[jnp.ndarray] = None,
        gt_labels: Optional[jnp.ndarray] = None,  # (B, M)
        gt_valid: Optional[jnp.ndarray] = None,  # (B, M)
        gt_masks: Optional[jnp.ndarray] = None,  # (B, M, H, W)
        train_psm: bool = False,  # SOLVER.TRAIN_PSM: supervise DispModule
        gt_disp: Optional[jnp.ndarray] = None,  # (B, H, W) full GT disparity
    ):
        b, img_h, img_w, _ = left.shape
        backbone = ResNetFPNBackbone(
            body=self.body, out_channels=self.out_channels, freeze_at=self.freeze_at,
            use_gn_body=self.use_gn, use_gn_fpn=self.use_gn_fpn,
            fbnet_scale_factor=self.fbnet_scale_factor,
            fbnet_width_divisor=self.fbnet_width_divisor,
            fbnet_dw_skip_bn=self.fbnet_dw_skip_bn,
            fbnet_dw_skip_relu=self.fbnet_dw_skip_relu,
            dtype=self.dtype, name="backbone",
        )
        feats = backbone(jnp.concatenate([left, right], axis=0))
        lf = [f[:b] for f in feats]
        rf = [f[b:] for f in feats]

        gen = AnchorGenerator(
            self.anchor_sizes, self.anchor_strides, self.aspect_ratios,
            self.straddle_thresh,
        )
        anchors_np, vis_np = gen((img_h, img_w), [f.shape[1:3] for f in feats])
        anchors = jnp.asarray(anchors_np)
        visibility = jnp.asarray(vis_np)

        head_outs = stereo_rpn.SRPNHead(
            in_channels=self.out_channels,
            num_anchors=gen.num_anchors_per_location,
            quirk_exact=self.srpn_quirk_exact,
            dtype=self.dtype,
            name="rpn_head",
        )(lf, rf, both_feats=feats)
        obj_logits, deltas = stereo_rpn.flatten_levels(head_outs)

        out = {}
        pre_nms = self.pre_nms_top_n_train if train else self.pre_nms_top_n_test
        post_nms = self.post_nms_top_n_train if train else self.post_nms_top_n_test
        proposals = stereo_rpn.postprocess_batched(
            anchors, obj_logits, deltas, (img_h, img_w), pre_nms, post_nms,
            self.rpn_nms_thresh, self.rpn_min_size,
            scores_are_probs=self.srpn_quirk_exact,
        )  # StereoBoxes with leading batch axis

        if train:
            rpn_key = self.make_rng("sampling")
            out["loss_objectness"], out["loss_rpn_box_reg"] = stereo_rpn.loss(
                rpn_key, anchors, visibility, obj_logits, deltas,
                gt_left, gt_right, gt_valid,
                self.rpn_fg_iou, self.rpn_bg_iou,
                self.rpn_batch_per_image, self.rpn_positive_fraction,
            )
            # append GT to proposals (SRPNPostProcessor.add_gt_proposals)
            proposals = StereoBoxes(
                left=jnp.concatenate([proposals.left, gt_left], axis=1),
                right=jnp.concatenate([proposals.right, gt_right], axis=1),
                score=jnp.concatenate(
                    [proposals.score, jnp.ones(gt_valid.shape, proposals.score.dtype)], axis=1
                ),
                valid=jnp.concatenate([proposals.valid, gt_valid], axis=1),
            )
            # per-image matching + balanced subsample, then gather-compact
            sub_key = self.make_rng("sampling")
            keys = jax.random.split(sub_key, b)
            labels, reg_targets, pos, sampled, matched_gt = jax.vmap(
                lambda k, p, glb, grb, glab, gv: bh.subsample(
                    k, p, glb, grb, glab, gv, self.roi_fg_iou, self.roi_bg_iou,
                    self.roi_batch_per_image, self.roi_positive_fraction,
                )
            )(keys, proposals, gt_left, gt_right, gt_labels, gt_valid)
            rois, roi_meta = _compact_sampled(
                proposals, labels, reg_targets, pos, sampled, matched_gt,
                self.roi_batch_per_image,
            )
        else:
            rois = proposals

        # flatten (B, P) ROIs -> (B*P,) with batch indices for pooling
        p = rois.left.shape[1]
        flat = lambda x: x.reshape((b * p,) + x.shape[2:])
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        rois_flat = StereoBoxes(
            left=flat(rois.left), right=flat(rois.right),
            score=flat(rois.score), valid=flat(rois.valid),
        )

        extractor = bh.StereoBoxFeatureExtractor(
            mlp_dim=self.mlp_head_dim, resolution=self.box_resolution,
            scales=self.pooler_scales, sampling_ratio=self.box_sampling_ratio,
            dtype=self.dtype, name="box_extractor",
        )
        x = extractor(lf[:-1], rf[:-1], rois_flat, batch_idx, train=train)
        class_logits, box_deltas = bh.StereoBoxPredictor(
            num_classes=self.num_classes, dtype=self.dtype, name="box_predictor"
        )(x)

        if train:
            labels_f, regt_f, pos_f, samp_f = (
                flat(roi_meta["labels"]), flat(roi_meta["reg_targets"]),
                flat(roi_meta["pos"]), flat(roi_meta["sampled"]),
            )
            out["loss_classifier"], out["loss_box_reg"] = bh.head_loss(
                class_logits, box_deltas, labels_f, regt_f, pos_f, samp_f
            )
            if self.mask_on:
                mask_logits = mh.MaskHead(
                    num_classes=self.num_classes, resolution=self.mask_resolution,
                    scales=self.pooler_scales, sampling_ratio=self.mask_sampling_ratio,
                    dtype=self.dtype, name="mask_head",
                )(lf[:-1], rois_flat.left, batch_idx)
                # gt mask lookup is per image: flatten gt index with batch offset
                mg = flat(roi_meta["matched_gt"]) + batch_idx * self.max_gt
                gm = gt_masks.reshape((-1,) + gt_masks.shape[2:])
                out["loss_mask"] = mh.mask_loss(
                    mask_logits, rois_flat.left, labels_f, pos_f, gm, mg
                )
            if self.dispnet_on and train_psm and gt_disp is not None:
                # In-framework iDispNet training on FPN ROI features
                # (reference DispRCNN forward TRAIN_PSM branch ->
                # DispModule.forward + its deep-supervised masked loss,
                # dispmodule.py:232-271): supervise on the POSITIVE sampled
                # ROIs (label==1 subsample_result semantics).
                from ..psmnet.dispmodule import DispModule, expand_left_right_freex
                from .disprcnn3d import warp_gt_disparity_to_roi

                dlb, drb = expand_left_right_freex(
                    rois_flat.left, rois_flat.right, float(img_w)
                )
                dres = self.dispnet_disp_resolution
                p1, p2, p3 = DispModule(
                    maxdisp=self.dispnet_maxdisp, mindisp=self.dispnet_mindisp,
                    resolution=self.dispnet_resolution, disp_resolution=dres,
                    pooler_scales=self.pooler_scales,
                    conv_layers=self.dispnet_conv_layers,
                    dtype=self.dtype, name="dispnet",
                )(lf[:-1], rf[:-1], dlb, drb, batch_idx, train=True)
                tgt = jax.vmap(
                    lambda bi, l_, r_: warp_gt_disparity_to_roi(
                        gt_disp[bi], l_, r_, dres
                    )
                )(batch_idx, dlb, drb)
                if gt_masks is not None:
                    gmask = _gt_mask_on_roi(gt_masks, flat(roi_meta["matched_gt"]),
                                            batch_idx, dlb, dres)
                else:
                    gmask = jnp.ones(tgt.shape, bool)
                m = (
                    gmask
                    & (tgt > self.dispnet_mindisp)
                    & (tgt < self.dispnet_maxdisp)
                    & pos_f[:, None, None]
                ).astype(p3.dtype)
                denom = jnp.maximum(jnp.sum(m), 1.0)
                loss = 0.0
                for w_, p_ in zip((0.5, 0.7, 1.0), (p1, p2, p3)):
                    ax = jnp.abs(p_ - tgt)
                    sl1 = jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)
                    loss = loss + w_ * jnp.sum(sl1 * m) / denom
                out["loss_psm"] = self.dispnet_loss_weight * loss
            out["proposals"] = proposals
            return out

        # ---- inference ----
        # natively batched: the vmapped per-image form's gathers lowered to
        # generic batched gathers — 2.47 ms of the 2D stage (profile_2d,
        # 2026-08-19) for P=300 worth of postproc
        dets = bh.postprocess_batched(
            class_logits.reshape(b, p, -1),
            box_deltas.reshape(b, p, -1),
            rois, (img_h, img_w), self.score_thresh, self.box_nms_thresh,
            self.detections_per_img, self.max_det,
        )
        out["detections"] = dets
        if self.mask_on:
            d = self.max_det
            det_flat_left = dets.left.reshape(b * d, 4)
            det_batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
            mask_logits = mh.MaskHead(
                num_classes=self.num_classes, resolution=self.mask_resolution,
                scales=self.pooler_scales, sampling_ratio=self.mask_sampling_ratio,
                dtype=self.dtype, name="mask_head",
            )(lf[:-1], det_flat_left, det_batch_idx)
            probs = mh.mask_probs(
                mask_logits, dets.fields["labels"].reshape(b * d)
            )
            out["masks"] = probs.reshape(b, d, *probs.shape[1:])
        if self.dispnet_on:
            # in-framework iDispNet over FPN ROI features (DISPNET_ON path,
            # reference DispRCNN forward -> DispModule)
            from ..psmnet.dispmodule import DispModule, expand_left_right_freex

            d = self.max_det
            lb, rb = expand_left_right_freex(
                dets.left.reshape(b * d, 4), dets.right.reshape(b * d, 4), float(img_w)
            )
            det_bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
            disp = DispModule(
                maxdisp=self.dispnet_maxdisp, mindisp=self.dispnet_mindisp,
                resolution=self.dispnet_resolution,
                disp_resolution=self.dispnet_disp_resolution,
                pooler_scales=self.pooler_scales,
                conv_layers=self.dispnet_conv_layers,
                dtype=self.dtype, name="dispnet",
            )(lf[:-1], rf[:-1], lb, rb, det_bi, train=False)
            out["disparity_roi"] = disp.reshape(b, d, *disp.shape[1:])
        return out


def _gt_mask_on_roi(
    gt_masks: jnp.ndarray,  # (B, M, H, W) full-image instance masks
    matched_gt: jnp.ndarray,  # (R,) per-ROI matched GT index
    batch_idx: jnp.ndarray,  # (R,)
    boxes: jnp.ndarray,  # (R, 4)
    size: int,
) -> jnp.ndarray:
    """Sample the matched GT instance mask on each ROI's pixel grid ->
    (R, size, size) bool (DispModule.prepare_target mask warping)."""
    from ..pointrcnn import lift

    b, m_, h, w = gt_masks.shape
    flat_masks = gt_masks.reshape(b * m_, h, w)
    gidx = batch_idx * m_ + jnp.clip(matched_gt, 0, m_ - 1)

    def one(gi, bx):
        mk = flat_masks[gi]
        gy = bx[1] + (jnp.arange(size) + 0.5) / size * (bx[3] - bx[1]) - 0.5
        gx = bx[0] + (jnp.arange(size) + 0.5) / size * (bx[2] - bx[0]) - 0.5
        return lift._bilinear_separable(mk, gy, gx) > 0.5

    return jax.vmap(one)(gidx, boxes)


def _compact_sampled(
    proposals: StereoBoxes,
    labels: jnp.ndarray,  # (B, P)
    reg_targets: jnp.ndarray,  # (B, P, 6)
    pos: jnp.ndarray,
    sampled: jnp.ndarray,
    matched_gt: jnp.ndarray,  # (B, P)
    roi_batch: int,
):
    """Gather the sampled rows into a fixed (B, roi_batch) block per image."""

    def per_image(p: StereoBoxes, lab, regt, po, sa, mg):
        pri = jnp.where(sa, 1.0, 0.0) + jnp.where(po, 1.0, 0.0)  # positives first
        _, idx = jax.lax.top_k(pri, roi_batch)
        keep = sa[idx]
        rois = p.take(idx, keep)
        meta = {
            "labels": jnp.where(keep, lab[idx], -1),
            "reg_targets": regt[idx],
            "pos": po[idx] & keep,
            "sampled": keep,
            "matched_gt": mg[idx],
        }
        return rois, meta

    return jax.vmap(per_image)(proposals, labels, reg_targets, pos, sampled, matched_gt)
