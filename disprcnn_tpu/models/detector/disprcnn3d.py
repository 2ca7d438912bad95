"""DispRCNN3D meta-architecture: offline 2D detections -> iDispNet -> PointRCNN.

Reference: modeling/detector/disprcnn3d.py:16-323. Consumes the 2D stage's
detections (boxes + mask probs), crops BOTH raw images to width-aligned
224x224 ROIs (one batched ROIAlign instead of the reference's per-ROI host
loop, disprcnn3d.py:62-159), runs the full PSMNet on the ROI batch — the
instance axis is the MXU batch — and lifts masked instance disparity to
pseudo-LiDAR for PointRCNN.

Training paths (SOLVER.TRAIN_PSM / TRAIN_PC, disprcnn3d.py:209-264):
- PSM: deep-supervised masked smooth-L1 between predicted ROI disparity and
  the GT full-image disparity warped into ROI coords, masked by
  (pred mask & GT mask).
- PC: matched-GT RPN labels + RCNN refinement losses (PointRCNN module).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pairwise_iou
from ...ops.roi_align import roi_align_batched
from ...structures.stereo import StereoBoxes
from ..pointrcnn import lift
from ..pointrcnn.point_rcnn import PointRCNN
from ..psmnet.psmnet import PSMNet

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def width_aligned_crop_boxes(left: jnp.ndarray, right: jnp.ndarray):
    """Integer-expanded boxes sharing a common width (disprcnn3d.py:62-96).

    Returns (left_crop (R,4), right_crop (R,4)) where both spans are
    max(w_left, w_right) wide starting at their own x1.
    """
    li = lift.expand_box_to_integer(left)
    ri = lift.expand_box_to_integer(right)
    w = jnp.maximum(li[:, 2] - li[:, 0], ri[:, 2] - ri[:, 0])
    lb = jnp.stack([li[:, 0], li[:, 1], li[:, 0] + w, li[:, 3]], axis=-1)
    rb = jnp.stack([ri[:, 0], li[:, 1], ri[:, 0] + w, li[:, 3]], axis=-1)
    return lb, rb


def crop_and_normalize(
    images: jnp.ndarray,  # (B, H, W, 3) RAW rgb in [0, 1]
    boxes: jnp.ndarray,  # (R, 4)
    batch_idx: jnp.ndarray,  # (R,)
    size: int = 224,
) -> jnp.ndarray:
    """224^2 crops, ImageNet-normalized (disprcnn3d.py:44-50)."""
    crops = roi_align_batched(
        images, boxes, batch_idx, size, 1.0, sampling_ratio=1,
        rois_per_image=(boxes.shape[0] // images.shape[0]
                        if boxes.shape[0] % images.shape[0] == 0 else None),
    )
    mean = jnp.asarray(IMAGENET_MEAN, crops.dtype)
    std = jnp.asarray(IMAGENET_STD, crops.dtype)
    return (crops - mean) / std


def warp_gt_disparity_to_roi(
    gt_disp: jnp.ndarray,  # (H, W) full-image GT disparity
    left_crop: jnp.ndarray,  # (4,)
    right_crop: jnp.ndarray,
    size: int = 224,
) -> jnp.ndarray:
    """GT disparity in ROI coords: sample over the left crop, value-rescale by
    size/width, shift by x1 - x1' (generate_psmnet_input_inf.py semantics)."""
    x1, y1, x2, y2 = left_crop[0], left_crop[1], left_crop[2], left_crop[3]
    w = x2 - x1
    h = y2 - y1
    gy = y1 + (jnp.arange(size) + 0.5) / size * h - 0.5
    gx = x1 + (jnp.arange(size) + 0.5) / size * w - 0.5
    vals = lift._bilinear_separable(gt_disp, gy, gx)
    # ROI disparity = full disparity - (x1 - x1'): inverse of the prediction
    # path's `disp_roi + x1 - x1p` (point_rcnn.py:217); the value rescale
    # follows DisparityMap.resize semantics.
    return (vals - (left_crop[0] - right_crop[0])) * (size / jnp.maximum(w, 1.0))


def remove_low_score_rois(
    dets: StereoBoxes, min_score: float, keep_at_least: int = 2
) -> StereoBoxes:
    """Invalidate detections below min_score, but always keep the top
    `keep_at_least` (reference disprcnn3d.py:192-207 remove_low_score_rois)."""
    score = jnp.where(dets.valid, dets.score, -1.0)
    above = score > min_score
    order = jnp.argsort(score, axis=-1, descending=True)
    rank = jnp.argsort(order, axis=-1)
    keep = above | (rank < keep_at_least)
    return dets.replace(valid=dets.valid & keep)


def remove_illegal_detections(dets: StereoBoxes, min_wh: float = 1.0) -> StereoBoxes:
    """Drop degenerate boxes (reference disprcnn3d.py:286-294)."""
    ok = (
        (dets.left[..., 2] - dets.left[..., 0] >= min_wh)
        & (dets.left[..., 3] - dets.left[..., 1] >= min_wh)
        & (dets.right[..., 2] - dets.right[..., 0] >= min_wh)
        & (dets.right[..., 3] - dets.right[..., 1] >= min_wh)
    )
    return dets.replace(valid=dets.valid & ok)


class DispRCNN3D(nn.Module):
    max_det: int = 32
    roi_size: int = 224
    maxdisp: int = 48
    mindisp: int = -48
    npoints: int = 768
    lift_grid: int = 112
    mask_thresh_train: float = 0.7
    mask_thresh_eval: float = 0.5
    roi_min_score: float = 0.05  # DISPNET.ROI_MIN_SCORE (train-path filter)
    max_roi_train: int = 0  # MAX_ROI_FOR_TRAINING; 0 = keep all max_det
    mean_size: Tuple[float, float, float] = (1.52563191462, 1.62856739989, 3.88311640418)
    det3d_on: bool = True  # MODEL.DET3D_ON: run the PointRCNN stage at all
    rcnn_enabled: bool = True
    rpn_fixed: bool = False
    proposals_per_roi: int = 16  # TEST.RPN_POST_NMS_TOP_N (build.py wires cfg)
    rpn_pre_nms_per_roi: int = 128  # TEST.RPN_PRE_NMS_TOP_N
    proposals_per_roi_train: Optional[int] = None  # TRAIN.RPN_POST_NMS_TOP_N
    rpn_pre_nms_per_roi_train: Optional[int] = None  # TRAIN.RPN_PRE_NMS_TOP_N
    rpn_nms_thresh_train: Optional[float] = None  # TRAIN.RPN_NMS_THRESH
    rcnn_rois_per_instance: int = 16
    sa_npoints: Tuple[int, ...] = (768, 512, 256, 64)  # rpn.yaml:15 SA_CONFIG
    rpn_loss_cls: str = "BinaryCrossEntropy"
    rcnn_loss_cls: str = "BinaryCrossEntropy"
    rpn_score_thresh: float = 0.3
    aug_data: bool = True  # POINTRCNN.AUG_DATA
    fg_aug_times: int = 10  # RCNN.ROI_FG_AUG_TIMES
    aug_rot_range: float = 18.0  # POINTRCNN.AUG_ROT_RANGE
    rpn_nms_rotated: bool = False  # RPN.NMS_TYPE
    rpn_distance_based: bool = False  # TEST.RPN_DISTANCE_BASED_PROPOSE
    rpn_nms_thresh: float = 0.8  # TEST.RPN_NMS_THRESH
    psm_hourglass: int = 3  # <3 only for the multichip dryrun (compile size)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        left_img: jnp.ndarray,  # (B, H, W, 3) raw [0,1] rgb
        right_img: jnp.ndarray,
        dets: StereoBoxes,  # batched (B, D, ...) offline 2D predictions;
        #   fields: 'mask' (B, D, M, M) probabilities
        calib: dict,  # {'fu','fv','cu','cv','tx','ty','fuxb'}: (B,) arrays
        train: bool = False,
        train_psm: bool = False,
        train_pc: bool = False,
        gt_disp: Optional[jnp.ndarray] = None,  # (B, H, W) full GT disparity
        gt_mask_full: Optional[jnp.ndarray] = None,  # (B, D_gt?, H, W) unused yet
        gt_left: Optional[jnp.ndarray] = None,  # (B, M, 4) for matching
        gt_boxes3d: Optional[jnp.ndarray] = None,  # (B, M, 7) xyzhwl_ry rect
        gt_valid: Optional[jnp.ndarray] = None,  # (B, M)
    ):
        dets = remove_illegal_detections(dets)
        if train:
            # train path filters low-score ROIs (keep >= 2) and caps the ROI
            # budget (reference disprcnn3d.py:215, 222-235): in fixed-shape
            # form the cap is a static top-K slice by score.
            dets = remove_low_score_rois(dets, self.roi_min_score)
            if self.max_roi_train and self.max_roi_train < dets.left.shape[1]:
                k = self.max_roi_train

                def topk_one(dv: StereoBoxes) -> StereoBoxes:
                    score = jnp.where(dv.valid, dv.score, -1.0)
                    _, idx = jax.lax.top_k(score, k)
                    return dv.take(idx, dv.valid[idx])

                dets = jax.vmap(topk_one)(dets)
        b, d = dets.left.shape[0], dets.left.shape[1]
        r = b * d
        img_h, img_w = left_img.shape[1], left_img.shape[2]
        flat = lambda x: x.reshape((r,) + x.shape[2:])
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        left_b, right_b = flat(dets.left), flat(dets.right)
        valid = flat(dets.valid)
        masks = flat(dets.fields["mask"])

        lb, rb = width_aligned_crop_boxes(left_b, right_b)
        left_crops = crop_and_normalize(left_img, lb, batch_idx, self.roi_size)
        right_crops = crop_and_normalize(right_img, rb, batch_idx, self.roi_size)

        psm = PSMNet(
            maxdisp=self.maxdisp, mindisp=self.mindisp,
            num_hourglass=self.psm_hourglass, dtype=self.dtype, name="idispnet"
        )
        out = {}
        if train and train_psm:
            preds = psm(left_crops, right_crops, train=True)
            disp_roi = preds[-1]
        else:
            disp_roi = psm(left_crops, right_crops, train=False)

        if train and train_psm and gt_disp is not None:
            tgt = jax.vmap(
                lambda bi, l, rr: warp_gt_disparity_to_roi(gt_disp[bi], l, rr, self.roi_size)
            )(batch_idx, lb, rb)
            # mask: predicted mask warped to the crop grid & target in range
            mgrid = _mask_on_crop(masks, left_b, lb, self.roi_size, self.mask_thresh_train)
            m = (
                mgrid
                & (tgt > self.mindisp)
                & (tgt < self.maxdisp)
                & valid[:, None, None]
            ).astype(disp_roi.dtype)
            denom = jnp.maximum(jnp.sum(m), 1.0)
            loss = 0.0
            # deep-supervision weights: last pred always carries 1.0
            # (stackhourglass deep supervision, train_psmnet loss weights)
            for w_, p in zip((0.5, 0.7, 1.0)[-len(preds):], preds):
                ax = jnp.abs(p - tgt)
                sl1 = jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)
                loss = loss + w_ * jnp.sum(sl1 * m) / denom
            out["loss_psm"] = loss
        out["disparity_roi"] = disp_roi

        run_3d = self.det3d_on and (train_pc if train else True)
        if not run_3d:
            return out

        # ---- pseudo-LiDAR lift ----
        # The reference builds the point clouds from DETACHED disparity
        # (point_rcnn.py process_input operates on stored fields; the 3D
        # losses never train the iDispNet — only loss_psm does). Backprop
        # through the disp->depth 1/x and the masked candidate machinery is
        # also numerically unsafe (NaN cotangents on masked-out lanes).
        disp_lift = jax.lax.stop_gradient(disp_roi)
        masks = jax.lax.stop_gradient(masks)
        g = lambda k: calib[k][batch_idx]
        mask_thresh = self.mask_thresh_train if train else self.mask_thresh_eval
        pts_cand, cand_ok = lift.roi_points_candidates(
            disp_lift, masks, left_b, right_b,
            g("fu"), g("fv"), g("cu"), g("cv"), g("tx"), g("ty"), g("fuxb"),
            grid=self.lift_grid, mask_thresh=mask_thresh,
            min_depth=0.0, max_depth=160.0,
        )
        key = self.make_rng("sampling")
        pts, has_pts = lift.sample_fixed_points(key, pts_cand, cand_ok, self.npoints)
        roi_ok = valid & has_pts
        angles = lift.canonical_angles(left_b, float(img_w), g("fu"))
        pts_c, pts_mean = lift.canonicalize(pts, angles)

        gt_match = gt_ok = None
        if train:
            # match detections to GT by left-box IoU (PointRCNN
            # match_targets_to_proposals)
            def match_one(lbx, v, gl, g3d, gv):
                iou = pairwise_iou(gl, lbx) * gv[:, None]
                best = jnp.argmax(iou, axis=0)
                best_iou = jnp.max(iou, axis=0)
                ok = (best_iou >= 0.5) & v
                return g3d[best], ok

            gt_match, gt_ok = jax.vmap(match_one)(
                dets.left, dets.valid, gt_left, gt_boxes3d, gt_valid
            )
            gt_match, gt_ok = flat(gt_match), flat(gt_ok)

        prcnn = PointRCNN(
            npoints=self.npoints, mean_size=self.mean_size,
            rcnn_enabled=self.rcnn_enabled, proposals_per_roi=self.proposals_per_roi,
            rpn_pre_nms_per_roi=self.rpn_pre_nms_per_roi,
            proposals_per_roi_train=self.proposals_per_roi_train,
            rpn_pre_nms_per_roi_train=self.rpn_pre_nms_per_roi_train,
            rpn_nms_thresh_train=self.rpn_nms_thresh_train,
            rcnn_rois_per_instance=self.rcnn_rois_per_instance,
            sa_npoints=self.sa_npoints, rpn_loss_cls=self.rpn_loss_cls,
            rcnn_loss_cls=self.rcnn_loss_cls,
            rpn_score_thresh=self.rpn_score_thresh,
            aug_data=self.aug_data, fg_aug_times=self.fg_aug_times,
            aug_rot_range=self.aug_rot_range,
            rpn_nms_rotated=self.rpn_nms_rotated,
            rpn_distance_based=self.rpn_distance_based,
            rpn_nms_thresh=self.rpn_nms_thresh,
            dtype=self.dtype, name="pointrcnn",
        )
        pr_out = prcnn(
            pts_c, roi_ok, angles, pts_mean,
            train=train and train_pc,
            gt_boxes3d=gt_match, gt_ok=gt_ok,
            rpn_fixed=self.rpn_fixed,
            sampling_key=self.make_rng("sampling") if train else None,
        )
        if train and train_pc:
            out.update({k: v for k, v in pr_out.items() if k.startswith("loss")})
        else:
            for k in ("box3d", "score3d", "random"):
                if k in pr_out:
                    out[k] = pr_out[k].reshape((b, d) + pr_out[k].shape[1:])
            out["roi_ok"] = roi_ok.reshape(b, d)
        return out


def _mask_on_crop(
    masks: jnp.ndarray,  # (R, M, M) probs in box coords
    box: jnp.ndarray,  # (R, 4) original left boxes
    crop: jnp.ndarray,  # (R, 4) integer crop boxes
    size: int,
    thresh: float,
) -> jnp.ndarray:
    """Sample each instance mask on the crop's pixel grid -> (R, size, size) bool."""

    def one(mk, bx, cb):
        h = cb[3] - cb[1]
        w = cb[2] - cb[0]
        gy = cb[1] + (jnp.arange(size) + 0.5) / size * h - 0.5
        gx = cb[0] + (jnp.arange(size) + 0.5) / size * w - 0.5
        m = mk.shape[-1]
        my = (gy - bx[1]) / jnp.maximum(bx[3] - bx[1], 1.0) * m - 0.5
        mx = (gx - bx[0]) / jnp.maximum(bx[2] - bx[0], 1.0) * m - 0.5
        return lift._bilinear_separable(mk, my, mx) > thresh

    return jax.vmap(one)(masks, box, crop)
