"""PointRCNN 3D stage: pseudo-LiDAR lift -> 3D RPN -> proposal layer -> RCNN.

Reference: .../lib/net/point_rcnn.py:18-471. The per-ROI host loops become the
batched ops in lift.py; each 2D detection is one fixed-768-point cloud on the
instance axis.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import bbox3d_codec as codec
from . import lift, rcnn3d, rpn3d


class PointRCNN(nn.Module):
    npoints: int = 768
    mean_size: Tuple[float, float, float] = (1.52563191462, 1.62856739989, 3.88311640418)  # h, w, l
    rpn_codec: codec.CodecCfg = codec.CodecCfg(
        loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12, xz_fine=False
    )
    rpn_use_bn: bool = True
    rpn_loss_cls: str = "BinaryCrossEntropy"
    rpn_score_thresh: float = 0.3
    proposals_per_roi: int = 16  # TEST.RPN_POST_NMS_TOP_N (reference 64-100;
    # the per-instance cloud holds one object, so smaller budgets trade a
    # little recall for RCNN pooling cost — build.py wires the cfg value)
    rpn_pre_nms_per_roi: int = 128  # TEST.RPN_PRE_NMS_TOP_N score cap before
    # rotated NMS (bounds the rotated-IoU matrix; clamped to npoints)
    rpn_nms_thresh: float = 0.8
    # train-time proposal budgets (TRAIN.RPN_PRE/POST_NMS_TOP_N / NMS_THRESH,
    # reference proposal_layer.py:19-24); None -> same as eval
    proposals_per_roi_train: Optional[int] = None
    rpn_pre_nms_per_roi_train: Optional[int] = None
    rpn_nms_thresh_train: Optional[float] = None
    rpn_nms_rotated: bool = False  # RPN.NMS_TYPE 'normal' (default) / 'rotate'
    rpn_distance_based: bool = False  # TEST.RPN_DISTANCE_BASED_PROPOSE
    rcnn_enabled: bool = True
    rcnn_num_points: int = 512
    rcnn_rois_per_instance: int = 16
    rcnn_score_thresh: float = 0.1
    rcnn_loss_cls: str = "BinaryCrossEntropy"  # RCNN.LOSS_CLS
    # train-time augmentation (POINTRCNN.AUG_DATA / RCNN.ROI_FG_AUG_TIMES /
    # AUG_ROT_RANGE)
    aug_data: bool = True
    fg_aug_times: int = 10
    aug_rot_range: float = 18.0
    sa_npoints: Tuple[int, ...] = (768, 512, 256, 64)  # rpn.yaml:15 ladder;
    # the lib/config.py default (4096-first) is pure overcompute on the
    # fixed-768 pseudo-LiDAR clouds
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pts: jnp.ndarray,  # (R, N, 3) canonical per-instance clouds
        roi_valid: jnp.ndarray,  # (R,)
        angles: jnp.ndarray,  # (R,) canonical rotation angles
        pts_mean: jnp.ndarray,  # (R, 3)
        train: bool = False,
        gt_boxes3d: Optional[jnp.ndarray] = None,  # (R, 7) matched, RECT frame
        gt_ok: Optional[jnp.ndarray] = None,  # (R,)
        rpn_fixed: bool = False,
        sampling_key: Optional[jax.Array] = None,
    ):
        anchor = jnp.asarray(self.mean_size, self.dtype)
        rpn = rpn3d.RPN3D(
            codec_cfg=self.rpn_codec, use_bn=self.rpn_use_bn,
            npoints=self.sa_npoints, dtype=self.dtype, name="rpn",
        )
        rpn_out = rpn(pts, train=train and not rpn_fixed)
        out = {}
        if train and gt_boxes3d is not None:
            gt_canon = lift.canonicalize_boxes3d(gt_boxes3d, angles, pts_mean)
            cls_label, reg_label = lift.rpn_point_labels(pts, gt_canon, gt_ok)
            if not rpn_fixed:
                out.update(
                    rpn3d.rpn_loss(
                        rpn_out["cls"], rpn_out["reg"], cls_label, reg_label,
                        roi_valid & gt_ok, anchor, self.rpn_codec,
                        loss_cls=self.rpn_loss_cls,
                    )
                )
        if not self.rcnn_enabled:
            out["rpn_cls"] = rpn_out["cls"]
            return out

        # proposals in the canonical frame, then rotate back to rect frame
        propose_fn = rpn3d.distance_propose if self.rpn_distance_based else rpn3d.propose
        pre_n = self.rpn_pre_nms_per_roi
        post_n = self.proposals_per_roi
        nms_th = self.rpn_nms_thresh
        if train:  # TRAIN.RPN_* budgets (proposal_layer.py:19-24)
            pre_n = self.rpn_pre_nms_per_roi_train or pre_n
            post_n = self.proposals_per_roi_train or post_n
            nms_th = self.rpn_nms_thresh_train or nms_th
        rois_c, roi_scores, prop_valid = propose_fn(
            rpn_out["cls"], rpn_out["reg"], rpn_out["xyz"], anchor, self.rpn_codec,
            pre_nms_top_n=min(pre_n, pts.shape[1]),
            post_nms_top_n=post_n,
            nms_thresh=nms_th,
            rotated=self.rpn_nms_rotated,
        )
        r, m = rois_c.shape[0], rois_c.shape[1]
        rois = _decanon_rois(rois_c, angles, pts_mean)
        prop_valid = prop_valid & roi_valid[:, None]

        # rect-frame points + features for pooling
        xyz_rect = lift.decanonicalize(rpn_out["xyz"], angles, pts_mean)
        seg_mask = (jax.nn.sigmoid(rpn_out["cls"]) > self.rpn_score_thresh).astype(self.dtype)

        if train:
            # full ProposalTargetLayer: fg/hard-bg sampling + ROI noise aug +
            # pooling + rot/scale/flip aug + canonical transform
            pts_input, cls_label, reg_mask, gt_ct, s_rois, s_ok = (
                rcnn3d.prepare_rcnn_train_inputs(
                    sampling_key, rois, prop_valid, gt_boxes3d,
                    gt_ok & roi_valid, xyz_rect, rpn_out["features"], seg_mask,
                    rois_per_instance=self.rcnn_rois_per_instance,
                    num_points=self.rcnn_num_points,
                    aug_data=self.aug_data, fg_aug_times=self.fg_aug_times,
                    aug_rot_range=self.aug_rot_range,
                )
            )
            k = s_rois.shape[1]
            cls_pred, reg_pred = rcnn3d.RCNNNet(dtype=self.dtype, name="rcnn")(
                pts_input.reshape(r * k, self.rcnn_num_points, -1), train=True
            )
            out["loss_box3d"] = rcnn3d.rcnn_loss(
                cls_pred, reg_pred, cls_label.reshape(-1),
                reg_mask.reshape(-1), gt_ct.reshape(-1, 7), anchor,
                loss_cls=self.rcnn_loss_cls,
            )
            return out

        pool_rois = rois
        k = pool_rois.shape[1]
        rc = rcnn3d.RCNNNet(dtype=self.dtype, name="rcnn")
        # Chunk the proposal axis: pooling + RCNN materialize
        # (R*M, 512, 5+C) activations — at the reference eval budget
        # (M=100) and 16 pairs that is 25.6k ROIs and OOMs (PERF.md r4c).
        # The reference streams ONE image at a time (TEST.IMS_PER_BATCH=1,
        # engine/inference.py:215-250); batching is this rebuild's whole
        # advantage, so instead scan proposal BLOCKS sized to keep the SA
        # mega-kernel's grid full while bounding live memory.
        nb = _roi_blocks(r, k)
        if nb == 1:
            pts_input, empty = rcnn3d.pool_rcnn_inputs(
                xyz_rect, rpn_out["features"], seg_mask, pool_rois,
                num_points=self.rcnn_num_points,
            )
            cls_pred, reg_pred = rc(
                pts_input.reshape(r * k, self.rcnn_num_points, -1),
                train=False,
            )
        else:
            mb = k // nb
            feats = rpn_out["features"]
            num_points = self.rcnn_num_points

            def _block(mod, carry, rois_blk):
                pts_in, e = rcnn3d.pool_rcnn_inputs(
                    xyz_rect, feats, seg_mask, rois_blk,
                    num_points=num_points,
                )
                c, g = mod(
                    pts_in.reshape(r * mb, num_points, -1), train=False)
                return carry, (c, g, e)

            blocks = jnp.moveaxis(
                pool_rois.reshape(r, nb, mb, 7), 1, 0)  # (nb, r, mb, 7)
            _, (cls_b, reg_b, emp_b) = nn.scan(
                _block,
                variable_broadcast=["params", "batch_stats"],
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )(rc, None, blocks)
            cls_pred = jnp.moveaxis(
                cls_b.reshape(nb, r, mb), 0, 1).reshape(r * k)
            reg_pred = jnp.moveaxis(
                reg_b.reshape(nb, r, mb, -1), 0, 1).reshape(r * k, -1)
            empty = jnp.moveaxis(emp_b, 0, 1).reshape(r, k)

        box3d, score3d, is_random = rcnn3d.rcnn_postprocess(
            cls_pred.reshape(r, k), reg_pred.reshape(r, k, -1), pool_rois,
            prop_valid & ~empty, roi_scores, anchor,
            score_thresh=self.rcnn_score_thresh,
        )
        out.update({"box3d": box3d, "score3d": score3d, "random": is_random})
        return out


def _roi_blocks(r: int, k: int) -> int:
    """Number of proposal blocks for the eval pool+RCNN scan: the smallest
    divisor nb of k keeping r*(k/nb) ROIs live at once under
    DISPRCNN_RCNN_ROI_BLOCK (default 6400: the r5o on-chip sweep at the
    reference budget measured caps 2048/4096/8192/no-scan =
    11.18/11.38/11.49/11.49 pairs/s — bigger blocks win — and at pairs=8
    caps 6400 and 8192 produce the SAME 6400-ROI blocks; 8000-ROI blocks
    OOM'd the pairs=10 probe [r5p], so 6400 is the largest cap that also
    keeps other pair counts feasible). Read at trace time like the other
    perf knobs; 1 (no scan) whenever the whole proposal axis already
    fits."""
    import os

    cap = int(os.environ.get("DISPRCNN_RCNN_ROI_BLOCK", "6400"))
    if r * k <= cap or k <= 1:
        return 1
    for nb in range(2, k + 1):
        if k % nb == 0 and r * (k // nb) <= cap:
            return nb
    return k


def _decanon_rois(rois_c: jnp.ndarray, angles: jnp.ndarray, pts_mean: jnp.ndarray):
    """(R, M, 7) canonical rois -> rect frame."""
    r, m, _ = rois_c.shape
    flat = rois_c.reshape(r * m, 7)
    ang = jnp.repeat(angles, m)
    mean = jnp.repeat(pts_mean, m, axis=0)
    return lift.decanonicalize_boxes3d(flat, ang, mean).reshape(r, m, 7)
