"""Config -> model construction (reference modeling/detector/detectors.py:11-14).

Dispatch mirrors the reference registry (modeling/rpn/rpn.py:201-209,
modeling/detector/*):
- MODEL.RETINANET_ON -> RetinaNetDetector (single-stage, single-view).
- "DispRCNN" / "GeneralizedRCNN" with MODEL.STEREO_ON -> the 2D stereo
  detector (every shipped config).
- "GeneralizedRCNN" with STEREO_ON=False -> mono Mask R-CNN (single-view RPN
  + box/mask heads; FPN or C4/C5 CONV_BODY).
- "DispRCNN3D": the stage-2/3 model consuming offline 2D predictions.
"""
from __future__ import annotations

import jax.numpy as jnp

from .detector.disprcnn import DispRCNN
from .detector.disprcnn3d import DispRCNN3D


def _dtype(cfg):
    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32


def build_detection_model(cfg):
    meta = cfg.MODEL.META_ARCHITECTURE
    if cfg.MODEL.RETINANET_ON:
        from .detector.retinanet_det import RetinaNetDetector

        r = cfg.MODEL.RETINANET
        return RetinaNetDetector(
            body=cfg.MODEL.BACKBONE.CONV_BODY.replace("-FPN", "").replace("-RETINANET", ""),
            out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            num_classes=r.NUM_CLASSES - 1,
            anchor_sizes=tuple(r.ANCHOR_SIZES),
            anchor_strides=tuple(r.ANCHOR_STRIDES),
            aspect_ratios=tuple(r.ASPECT_RATIOS),
            octave=r.OCTAVE,
            scales_per_octave=r.SCALES_PER_OCTAVE,
            fg_iou=r.FG_IOU_THRESHOLD,
            bg_iou=r.BG_IOU_THRESHOLD,
            loss_gamma=r.LOSS_GAMMA,
            loss_alpha=r.LOSS_ALPHA,
            pre_nms_top_n=r.PRE_NMS_TOP_N,
            score_thresh=r.INFERENCE_TH,
            nms_thresh=r.NMS_TH,
            max_det=cfg.TEST.DETECTIONS_PER_IMG,
            use_gn=cfg.MODEL.BACKBONE.USE_GN,
            dtype=_dtype(cfg),
        )
    if meta == "GeneralizedRCNN" and not cfg.MODEL.STEREO_ON:
        from .detector.generalized_rcnn import GeneralizedRCNN

        return GeneralizedRCNN(
            body=cfg.MODEL.BACKBONE.CONV_BODY,
            out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            anchor_sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
            anchor_strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
            aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            pre_nms_top_n_train=cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN,
            pre_nms_top_n_test=cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST,
            post_nms_top_n_train=cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN,
            post_nms_top_n_test=cfg.MODEL.RPN.POST_NMS_TOP_N_TEST,
            rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            mlp_head_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
            roi_batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH,
            box_nms_thresh=cfg.MODEL.ROI_HEADS.NMS,
            max_det=cfg.TPU.MAX_DETECTIONS,
            max_gt=cfg.TPU.MAX_GT,
            mask_on=cfg.MODEL.MASK_ON,
            use_gn=cfg.MODEL.BACKBONE.USE_GN,
            fbnet_scale_factor=cfg.MODEL.FBNET.SCALE_FACTOR,
            fbnet_width_divisor=cfg.MODEL.FBNET.WIDTH_DIVISOR,
            dtype=_dtype(cfg),
        )
    if meta in ("DispRCNN", "GeneralizedRCNN"):
        body = cfg.MODEL.BACKBONE.CONV_BODY.replace("-FPN", "")
        return DispRCNN(
            body=body,
            out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            anchor_sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
            anchor_strides=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
            aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            straddle_thresh=cfg.MODEL.RPN.STRADDLE_THRESH,
            pre_nms_top_n_train=cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN,
            pre_nms_top_n_test=cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST,
            post_nms_top_n_train=cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN,
            post_nms_top_n_test=cfg.MODEL.RPN.POST_NMS_TOP_N_TEST,
            rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            rpn_min_size=cfg.MODEL.RPN.MIN_SIZE,
            rpn_fg_iou=cfg.MODEL.RPN.FG_IOU_THRESHOLD,
            rpn_bg_iou=cfg.MODEL.RPN.BG_IOU_THRESHOLD,
            rpn_batch_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            mlp_head_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
            box_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            box_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            pooler_scales=tuple(cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES),
            roi_batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            roi_fg_iou=cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
            roi_bg_iou=cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH,
            box_nms_thresh=cfg.MODEL.ROI_HEADS.NMS,
            detections_per_img=cfg.TEST.DETECTIONS_PER_IMG,
            max_det=cfg.TPU.MAX_DETECTIONS,
            max_gt=cfg.TPU.MAX_GT,
            mask_on=cfg.MODEL.MASK_ON,
            mask_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
            mask_sampling_ratio=cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO,
            dispnet_on=cfg.MODEL.DISPNET_ON,
            dispnet_maxdisp=cfg.MODEL.DISPNET.MAX_DISP,
            dispnet_mindisp=cfg.MODEL.DISPNET.MIN_DISP,
            dispnet_resolution=cfg.MODEL.DISPNET.RESOLUTIONS[0],
            dispnet_disp_resolution=cfg.MODEL.DISPNET.DISP_RESOLUTIONS[0],
            dispnet_conv_layers=tuple(cfg.MODEL.DISPNET.CONV_LAYERS),
            dispnet_loss_weight=cfg.MODEL.DISPNET.LOSS_WEIGHT,
            use_gn=cfg.MODEL.BACKBONE.USE_GN,
            use_gn_fpn=cfg.MODEL.FPN.USE_GN,
            srpn_quirk_exact=cfg.TPU.SRPN_QUIRK_EXACT,
            fbnet_scale_factor=cfg.MODEL.FBNET.SCALE_FACTOR,
            fbnet_width_divisor=cfg.MODEL.FBNET.WIDTH_DIVISOR,
            fbnet_dw_skip_bn=cfg.MODEL.FBNET.DW_CONV_SKIP_BN,
            fbnet_dw_skip_relu=cfg.MODEL.FBNET.DW_CONV_SKIP_RELU,
            dtype=_dtype(cfg),
        )
    if meta == "DispRCNN3D":
        if cfg.SOLVER.TRAIN_PSM:
            max_roi_train = cfg.MODEL.DISPNET.MAX_ROI_FOR_TRAINING
        elif cfg.SOLVER.TRAIN_PC:
            max_roi_train = cfg.MODEL.PCNET.MAX_ROI_FOR_TRAINING
        else:
            max_roi_train = 0
        # every shipped config writes MEAN_SIZE as (h, w, l) — the codec order
        mean_size = tuple(cfg.MODEL.POINTRCNN.MEAN_SIZE[0])
        return DispRCNN3D(
            max_det=cfg.TPU.MAX_DETECTIONS,
            roi_size=cfg.TPU.ROI_CROP_SIZE,
            maxdisp=cfg.MODEL.DISPNET.MAX_DISP,
            mindisp=cfg.MODEL.DISPNET.MIN_DISP,
            npoints=cfg.MODEL.POINTRCNN.RPN.NPOINTS,
            # the reference thresholds BOTH paths by POINTRCNN.MASK_THRESH
            # (point_rcnn.py:24 masker_threshold; eval Masker threshold ditto)
            mask_thresh_train=cfg.MODEL.POINTRCNN.MASK_THRESH,
            mask_thresh_eval=cfg.MODEL.POINTRCNN.MASK_THRESH,
            mean_size=mean_size,
            det3d_on=cfg.MODEL.DET3D_ON,
            rcnn_enabled=cfg.MODEL.POINTRCNN.RCNN.ENABLED,
            rpn_fixed=cfg.MODEL.POINTRCNN.RPN.FIXED,
            rcnn_rois_per_instance=cfg.MODEL.POINTRCNN.RCNN.ROI_PER_IMAGE,
            roi_min_score=cfg.MODEL.DISPNET.ROI_MIN_SCORE,
            max_roi_train=max_roi_train,
            sa_npoints=tuple(cfg.MODEL.POINTRCNN.RPN.SA_CONFIG.NPOINTS),
            rpn_loss_cls=cfg.MODEL.POINTRCNN.RPN.LOSS_CLS,
            rcnn_loss_cls=cfg.MODEL.POINTRCNN.RCNN.LOSS_CLS,
            rpn_score_thresh=cfg.MODEL.POINTRCNN.RPN.SCORE_THRESH,
            aug_data=cfg.MODEL.POINTRCNN.AUG_DATA,
            fg_aug_times=cfg.MODEL.POINTRCNN.RCNN.ROI_FG_AUG_TIMES,
            aug_rot_range=cfg.MODEL.POINTRCNN.AUG_ROT_RANGE,
            rpn_nms_rotated=cfg.MODEL.POINTRCNN.RPN.NMS_TYPE == "rotate",
            rpn_distance_based=cfg.MODEL.POINTRCNN.TEST.RPN_DISTANCE_BASED_PROPOSE,
            rpn_nms_thresh=cfg.MODEL.POINTRCNN.TEST.RPN_NMS_THRESH,
            # proposal budgets (reference proposal_layer.py:19-24 reads
            # cfg[TRAIN|TEST].RPN_PRE/POST_NMS_TOP_N per mode)
            rpn_pre_nms_per_roi=cfg.MODEL.POINTRCNN.TEST.RPN_PRE_NMS_TOP_N,
            proposals_per_roi=cfg.MODEL.POINTRCNN.TEST.RPN_POST_NMS_TOP_N,
            rpn_pre_nms_per_roi_train=cfg.MODEL.POINTRCNN.TRAIN.RPN_PRE_NMS_TOP_N,
            proposals_per_roi_train=cfg.MODEL.POINTRCNN.TRAIN.RPN_POST_NMS_TOP_N,
            rpn_nms_thresh_train=cfg.MODEL.POINTRCNN.TRAIN.RPN_NMS_THRESH,
            dtype=_dtype(cfg),
        )
    raise NotImplementedError(meta)
