"""3D RCNN refinement stage (canonical per-proposal PointNet).

Reference: .../lib/net/rcnn_net.py:24-242, rpn/proposal_target_layer.py:15-348,
net/rcnn_loss.py:9-134, net/rcnn_inference.py:12-128.

Pipeline (per 2D instance, fixed M proposals):
- pool NUM_POINTS=512 points + features per proposal box (enlarged by
  POOL_EXTRA_WIDTH) with roipool3d; extra channels = seg_mask, depth/70-0.5,
- canonical transform: subtract roi centre, rotate by roi yaw,
- xyz-up SharedMLP on the first (3+2) channels, merge with RPN features,
  3 SA modules (128 -> 32 -> all), cls + bin-reg heads,
- train: IoU3D-based fg/bg sampling (fg>=0.55, hard/easy bg split), BCE cls on
  iou>0.6 labels, canonical bin-based reg on fg,
- eval: sigmoid scores, threshold, take the best refined box per instance
  (falling back to the best RPN proposal — the reference's `random` flag).

Train-time augmentation (proposal_target_layer.py:219-348) is implemented in
fixed-shape PRNG-keyed form: `aug_roi_by_noise` draws all `aug_times`
candidates at once and takes the first above the IoU threshold (matching the
reference's rejection loop in distribution), and `rcnn_data_augmentation`
applies the joint rotation (alpha-preserving ry update), +-5% scaling and
x-flip to pooled points, rois and GT — including the reference's
`(rand - 0.5 / 0.5)` precedence quirk that makes the rotation one-sided.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.iou import pairwise_iou3d
from ...ops.roipool3d import roipool3d
from ...structures.boxes3d import rotate_points_along_y
from . import bbox3d_codec as codec
from .pointnet2 import SAModule, SharedMLP


RCNN_CODEC = codec.CodecCfg(
    loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9, xz_fine=True, ry_fine=True
)


class RCNNNet(nn.Module):
    xyz_up: Sequence[int] = (128, 128)
    sa_npoints: Sequence[int] = (128, 32, -1)
    sa_radius: Sequence[float] = (0.2, 0.4, 100.0)
    sa_nsample: Sequence[int] = (64, 64, 64)
    sa_mlps: Sequence[Sequence[int]] = ((128, 128, 128), (128, 128, 256), (256, 256, 512))
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    use_bn: bool = False
    dp_ratio: float = 0.0
    input_extra: int = 2  # seg_mask + depth
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts_input: jnp.ndarray, train: bool = False):
        """pts_input (B, NUM_POINTS, 5 + C_rpn) -> (cls (B,), reg (B, C))."""
        nc_in = 3 + self.input_extra
        xyz = pts_input[..., 0:3]
        xyz_feat = SharedMLP(self.xyz_up, self.use_bn, self.dtype, name="xyz_up")(
            pts_input[..., :nc_in][:, :, None, :], train
        )[:, :, 0, :]
        rpn_feat = pts_input[..., nc_in:]
        merged = SharedMLP(
            (self.xyz_up[-1],), self.use_bn, self.dtype, name="merge_down"
        )(jnp.concatenate([xyz_feat, rpn_feat], axis=-1)[:, :, None, :], train)[:, :, 0, :]

        feats = merged
        cur_xyz = xyz
        for i, (npt, r, ns, mlp) in enumerate(
            zip(self.sa_npoints, self.sa_radius, self.sa_nsample, self.sa_mlps)
        ):
            cur_xyz, feats = SAModule(
                npoint=None if npt == -1 else npt, radius=r, nsample=ns, mlp=mlp,
                use_bn=self.use_bn, dtype=self.dtype, name=f"sa{i}",
            )(cur_xyz, feats, train)

        def head(x, hidden, out, name):
            for i, c in enumerate(hidden):
                x = nn.Dense(c, dtype=self.dtype, name=f"{name}_fc{i}")(x)
                x = nn.relu(x)
                if i == 0 and self.dp_ratio > 0:
                    x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
            return nn.Dense(out, dtype=self.dtype, name=f"{name}_out")(x)

        g = feats[:, 0, :]  # group-all leaves one descriptor
        cls = head(g, self.cls_fc, 1, "cls")[:, 0]
        reg = head(g, self.reg_fc, RCNN_CODEC.reg_channels, "reg")
        return cls, reg


def pool_rcnn_inputs(
    xyz: jnp.ndarray,  # (R, N, 3) rect-frame points
    rpn_feats: jnp.ndarray,  # (R, N, C)
    seg_mask: jnp.ndarray,  # (R, N)
    rois: jnp.ndarray,  # (R, M, 7)
    num_points: int = 512,
    pool_extra_width: float = 1.0,
):
    """-> pts_input (R, M, num_points, 5 + C), empty (R, M).

    Canonically transformed (centre-subtracted, yaw-rotated) as in
    rcnn_net.py:163-190.
    """
    depth = jnp.linalg.norm(xyz, axis=-1) / 70.0 - 0.5
    feats = jnp.concatenate([seg_mask[..., None], depth[..., None], rpn_feats], axis=-1)
    grown = rois.at[..., 3:6].add(pool_extra_width * 2).at[..., 1].add(pool_extra_width)
    # seg (0/1) is bf16-exact; rpn features are exact when stored bf16;
    # depth is a fresh f32 norm -> always 3-split in the fused gather.
    # DISPRCNN_ROIPOOL_F32DOT=1: A/B fallback to the pre-r5 f32 gather
    # dot (env read HERE at model trace time so per-config retraces see
    # it; the fused op's jit key carries it as the static value)
    import os as _os

    # DEFAULT = f32dot since the r5f on-chip A/B (2026-08-20): the bf16
    # split dot LOST 7.94 vs 6.39 ms at the reference geometry — the
    # gather dot was never the segment's bound; the split build +
    # post-dot recombine cost more than the 4x MXU rate saved.
    # DISPRCNN_ROIPOOL_BF16=1 re-enables the split for re-runs.
    f32ch = (((1,) if rpn_feats.dtype == jnp.bfloat16
              else (1,) + tuple(range(2, feats.shape[-1])))
             if _os.environ.get("DISPRCNN_ROIPOOL_BF16") == "1"
             else "f32dot")
    pooled, empty = roipool3d(xyz, feats, grown, sampled_pts_num=num_points,
                              f32_feat_channels=f32ch)
    # canonical transform about the UN-enlarged roi
    center = rois[..., 0:3]
    p_xyz = pooled[..., 0:3] - center[:, :, None, :]
    r, m = rois.shape[0], rois.shape[1]
    p_xyz = rotate_points_along_y(
        p_xyz.reshape(r * m, num_points, 3), rois[..., 6].reshape(r * m)
    ).reshape(r, m, num_points, 3)
    return jnp.concatenate([p_xyz, pooled[..., 3:]], axis=-1), empty


def canonical_gt(rois: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """GT boxes in each roi's canonical frame (proposal_target_layer's
    canonical transform): centre offset rotated by roi yaw, ry relative."""
    offset = gt[..., 0:3] - rois[..., 0:3]
    shape = offset.shape
    off = rotate_points_along_y(
        offset.reshape(-1, 1, 3), rois[..., 6].reshape(-1)
    ).reshape(shape)
    out = jnp.concatenate(
        [off, gt[..., 3:6], (gt[..., 6] - rois[..., 6])[..., None]], axis=-1
    )
    return out


# pos_range, hwl_range, angle_range per difficulty tier
# (proposal_target_layer.random_aug_box3d REG_AUG_METHOD='multiple')
_AUG_RANGES = (
    (0.2, 0.1, math.pi / 12),
    (0.3, 0.15, math.pi / 12),
    (0.5, 0.15, math.pi / 9),
    (0.8, 0.15, math.pi / 6),
    (1.0, 0.15, math.pi / 3),
)


def _random_aug_box3d(key: jax.Array, box: jnp.ndarray) -> jnp.ndarray:
    """One noised candidate of a (7,) box (random_aug_box3d 'multiple')."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ranges = jnp.asarray(_AUG_RANGES, box.dtype)
    row = ranges[jax.random.randint(k1, (), 0, len(_AUG_RANGES))]
    pos = (jax.random.uniform(k2, (3,), box.dtype) - 0.5) / 0.5 * row[0]
    hwl = (jax.random.uniform(k3, (3,), box.dtype) - 0.5) / 0.5 * row[1] + 1.0
    ang = (jax.random.uniform(k4, (), box.dtype) - 0.5) / 0.5 * row[2]
    return jnp.concatenate([box[0:3] + pos, box[3:6] * hwl, box[6:7] + ang])


def aug_roi_by_noise(
    key: jax.Array,
    rois: jnp.ndarray,  # (K, 7)
    gts: jnp.ndarray,  # (K, 7) matched GT per roi
    iou_src: jnp.ndarray,  # (K,)
    pos_thresh: float,
    aug_times: int = 10,
    fg_mask: jnp.ndarray = None,  # (K,) — bg rois get exactly ONE trial
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ROI noise augmentation (aug_roi_by_noise_torch,
    proposal_target_layer.py:219-246): fixed-shape form draws all
    `aug_times` trials at once — each keeps the original with p=0.2,
    otherwise perturbs it — and selects the FIRST trial whose IoU3D with the
    GT clears `pos_thresh` (the last trial if none does, as the reference's
    loop leaves the last attempt in place). Background rois are augmented
    with aug_times=1 (proposal_target_layer.py:170). Returns (rois', iou')."""
    if aug_times <= 0:
        return rois, iou_src
    if fg_mask is None:
        fg_mask = jnp.ones(rois.shape[0], bool)

    def per(k, roi, gt, src_iou, is_fg):
        kk, kb = jax.random.split(k)
        keep = jax.random.uniform(kb, (aug_times,)) < 0.2
        cands = jax.vmap(_random_aug_box3d, in_axes=(0, None))(
            jax.random.split(kk, aug_times), roi
        )
        cands = jnp.where(keep[:, None], roi[None, :], cands)
        ious = pairwise_iou3d(cands, gt[None])[:, 0]
        success = ious >= pos_thresh
        sel_fg = jnp.where(jnp.any(success), jnp.argmax(success), aug_times - 1)
        sel = jnp.where(is_fg, sel_fg, 0)  # bg: single trial
        out_iou = jnp.where(keep[sel], src_iou, ious[sel])
        return cands[sel], out_iou

    keys = jax.random.split(key, rois.shape[0])
    return jax.vmap(per)(keys, rois, gts, iou_src, fg_mask)


def rcnn_data_augmentation(
    key: jax.Array,
    pts: jnp.ndarray,  # (K, P, 3) pooled rect-frame points
    rois: jnp.ndarray,  # (K, 7)
    gts: jnp.ndarray,  # (K, 7)
    aug_rot_range: float = 18.0,
):
    """Joint rotation/scaling/flip augmentation of pooled points + boxes
    (proposal_target_layer.data_augmentation:291-348). The ry of the rotated
    boxes is updated by PRESERVING alpha (viewing angle), not by adding the
    rotation. Faithfully reproduces the reference's `(rand - 0.5 / 0.5)`
    precedence quirk: rotation angles are drawn from
    (U[0,1] - 1) * pi/range, i.e. one-sided."""
    k1, k2, k3 = jax.random.split(key, 3)
    n = rois.shape[0]
    angles = (jax.random.uniform(k1, (n,)) - 0.5 / 0.5) * (math.pi / aug_rot_range)

    def alpha_of(b):
        beta = jnp.arctan2(b[..., 2], b[..., 0])
        return -jnp.sign(beta) * math.pi / 2 + beta + b[..., 6], beta

    gt_alpha, _ = alpha_of(gts)
    roi_alpha, _ = alpha_of(rois)

    pts = rotate_points_along_y(pts, angles)

    def rot_box(b, alpha):
        c = rotate_points_along_y(b[:, None, 0:3], angles)[:, 0]
        beta = jnp.arctan2(c[:, 2], c[:, 0])
        ry = jnp.sign(beta) * math.pi / 2 + alpha - beta
        return jnp.concatenate([c, b[:, 3:6], ry[:, None]], axis=-1)

    gts = rot_box(gts, gt_alpha)
    rois = rot_box(rois, roi_alpha)

    scales = 1.0 + (jax.random.uniform(k2, (n,)) - 0.5) / 0.5 * 0.05
    pts = pts * scales[:, None, None]
    gts = gts.at[:, 0:6].multiply(scales[:, None])
    rois = rois.at[:, 0:6].multiply(scales[:, None])

    flip = jnp.sign(jax.random.uniform(k3, (n,)) - 0.5)
    pts = pts.at[..., 0].multiply(flip[:, None])

    def flip_box(b):
        x = b[:, 0] * flip
        ry = jnp.where(flip == 1.0, b[:, 6], jnp.sign(b[:, 6]) * math.pi - b[:, 6])
        return jnp.concatenate([x[:, None], b[:, 1:6], ry[:, None]], axis=-1)

    return pts, flip_box(rois), flip_box(gts)


def sample_rcnn_rois(
    key: jax.Array,
    rois: jnp.ndarray,  # (R, M, 7)
    roi_valid: jnp.ndarray,  # (R, M)
    gt: jnp.ndarray,  # (R, 7) one matched gt per instance
    gt_ok: jnp.ndarray,  # (R,)
    rois_per_instance: int = 16,
    fg_ratio: float = 0.5,
    reg_fg_thresh: float = 0.55,
    cls_fg_thresh: float = 0.6,
    cls_bg_thresh: float = 0.45,
    cls_bg_thresh_lo: float = 0.05,
    hard_bg_ratio: float = 0.8,
):
    """-> (sampled_rois (R, K, 7), s_iou (R, K), fg_slot (R, K), ok (R, K)).

    Fg / hard-bg / easy-bg split with HARD_BG_RATIO
    (proposal_target_layer.sample_rois_for_rcnn + sample_bg_inds). Labels are
    computed AFTER noise augmentation by `rcnn_labels` — the reference
    labels against the augmented IoU."""
    r, m, _ = rois.shape
    keys = jax.random.split(key, r)
    n_fg = int(round(rois_per_instance * fg_ratio))
    fg_thresh = min(reg_fg_thresh, cls_fg_thresh)

    def per_instance(k, roi, rv, g, gok):
        iou = pairwise_iou3d(roi, g[None])[:, 0] * rv
        is_fg = (iou >= fg_thresh) & rv & gok
        hard_bg = (iou >= cls_bg_thresh_lo) & (iou < cls_bg_thresh) & rv
        easy_bg = (iou < cls_bg_thresh_lo) & rv
        k1, k2, k3 = jax.random.split(k, 3)
        prio = lambda kk, mask: jnp.where(mask, jax.random.uniform(kk, (m,)), -1.0)
        # fg slots
        _, fg_idx = jax.lax.top_k(prio(k1, is_fg), n_fg)
        fg_cnt = jnp.minimum(jnp.sum(is_fg), n_fg)
        # bg slots: hard first (ratio), then easy
        n_bg = rois_per_instance - n_fg
        n_hard = int(round(n_bg * hard_bg_ratio))
        _, hard_idx = jax.lax.top_k(prio(k2, hard_bg), n_bg)
        _, easy_idx = jax.lax.top_k(prio(k3, easy_bg), n_bg)
        hard_cnt = jnp.minimum(jnp.sum(hard_bg), n_hard)
        slot = jnp.arange(n_bg)
        bg_idx = jnp.where(slot < hard_cnt, hard_idx, easy_idx[slot - hard_cnt])
        bg_ok = (slot < hard_cnt) | (easy_bg[easy_idx[jnp.maximum(slot - hard_cnt, 0)]])
        idx = jnp.concatenate([fg_idx, bg_idx])
        ok = jnp.concatenate([jnp.arange(n_fg) < fg_cnt, bg_ok])
        fg_slot = jnp.concatenate([jnp.arange(n_fg) < fg_cnt, jnp.zeros(n_bg, bool)])
        return roi[idx], iou[idx], fg_slot, ok

    return jax.vmap(per_instance)(keys, rois, roi_valid, gt, gt_ok)


def prepare_rcnn_train_inputs(
    key: jax.Array,
    rois: jnp.ndarray,  # (R, M, 7) proposals (rect frame)
    roi_valid: jnp.ndarray,  # (R, M)
    gt: jnp.ndarray,  # (R, 7)
    gt_ok: jnp.ndarray,  # (R,)
    xyz: jnp.ndarray,  # (R, N, 3) rect-frame points
    rpn_feats: jnp.ndarray,  # (R, N, C)
    seg_mask: jnp.ndarray,  # (R, N)
    rois_per_instance: int = 16,
    num_points: int = 512,
    aug_data: bool = True,
    fg_aug_times: int = 10,
    aug_rot_range: float = 18.0,
    reg_fg_thresh: float = 0.55,
    cls_fg_thresh: float = 0.6,
    cls_bg_thresh: float = 0.45,
    pool_extra_width: float = 1.0,
):
    """The full ProposalTargetLayer (proposal_target_layer.py:15-120):
    sample -> ROI noise aug -> pool -> rot/scale/flip aug -> canonical.

    -> (pts_input (R, K, num_points, 5 + C), cls_label (R, K),
        reg_mask (R, K), gt_ct (R, K, 7), s_rois (R, K, 7), ok (R, K))."""
    k_s, k_n, k_a = jax.random.split(key, 3)
    r = rois.shape[0]
    k = rois_per_instance
    s_rois, s_iou, fg_slot, ok = sample_rcnn_rois(
        k_s, rois, roi_valid, gt, gt_ok, rois_per_instance=k,
        reg_fg_thresh=reg_fg_thresh, cls_fg_thresh=cls_fg_thresh,
        cls_bg_thresh=cls_bg_thresh,
    )
    gt_rep = jnp.broadcast_to(gt[:, None, :], (r, k, 7))
    if aug_data and fg_aug_times > 0:
        flat = lambda x: x.reshape((r * k,) + x.shape[2:])
        a_rois, a_iou = aug_roi_by_noise(
            k_n, flat(s_rois), flat(gt_rep), flat(s_iou),
            pos_thresh=min(reg_fg_thresh, cls_fg_thresh),
            aug_times=fg_aug_times, fg_mask=flat(fg_slot),
        )
        s_rois = a_rois.reshape(r, k, 7)
        s_iou = a_iou.reshape(r, k)

    # pool raw (pre-canonical) points + features per augmented roi
    depth = jnp.linalg.norm(xyz, axis=-1) / 70.0 - 0.5
    feats = jnp.concatenate(
        [seg_mask[..., None], depth[..., None], rpn_feats], axis=-1
    )
    grown = s_rois.at[..., 3:6].add(pool_extra_width * 2).at[..., 1].add(pool_extra_width)
    import os as _os

    # DEFAULT = f32dot since the r5f on-chip A/B (2026-08-20): the bf16
    # split dot LOST 7.94 vs 6.39 ms at the reference geometry — the
    # gather dot was never the segment's bound; the split build +
    # post-dot recombine cost more than the 4x MXU rate saved.
    # DISPRCNN_ROIPOOL_BF16=1 re-enables the split for re-runs.
    f32ch = (((1,) if rpn_feats.dtype == jnp.bfloat16
              else (1,) + tuple(range(2, feats.shape[-1])))
             if _os.environ.get("DISPRCNN_ROIPOOL_BF16") == "1"
             else "f32dot")
    pooled, empty = roipool3d(xyz, feats, grown, sampled_pts_num=num_points,
                              f32_feat_channels=f32ch)
    p_xyz = pooled[..., 0:3]
    p_feats = pooled[..., 3:]

    if aug_data:
        flat3 = lambda x: x.reshape((r * k,) + x.shape[2:])
        pts_f, rois_f, gts_f = rcnn_data_augmentation(
            k_a, flat3(p_xyz), flat3(s_rois), flat3(gt_rep), aug_rot_range
        )
        p_xyz = pts_f.reshape(r, k, num_points, 3)
        s_rois = rois_f.reshape(r, k, 7)
        gt_rep = gts_f.reshape(r, k, 7)

    # canonical transform about the augmented roi
    center = s_rois[..., 0:3]
    p_xyz = p_xyz - center[:, :, None, :]
    p_xyz = rotate_points_along_y(
        p_xyz.reshape(r * k, num_points, 3), s_rois[..., 6].reshape(r * k)
    ).reshape(r, k, num_points, 3)
    gt_ct = canonical_gt(s_rois, gt_rep)

    # labels from the AUGMENTED iou; pooled-empty rois are ignored
    valid = ok & ~empty
    cls = jnp.where(
        s_iou > cls_fg_thresh, 1.0, jnp.where(s_iou < cls_bg_thresh, 0.0, -1.0)
    )
    cls_label = jnp.where(valid, cls, -1.0)
    reg_mask = (s_iou > reg_fg_thresh) & valid
    pts_input = jnp.concatenate([p_xyz, p_feats], axis=-1)
    return pts_input, cls_label, reg_mask, gt_ct, s_rois, valid


def rcnn_loss(
    cls_pred: jnp.ndarray,  # (B,) raw logits
    reg_pred: jnp.ndarray,  # (B, C)
    cls_label: jnp.ndarray,  # (B,) {1, 0, -1}
    reg_mask: jnp.ndarray,  # (B,)
    gt_ct: jnp.ndarray,  # (B, 7) canonical gt
    anchor_size: jnp.ndarray,
    loss_cls: str = "BinaryCrossEntropy",  # RCNN.LOSS_CLS (rcnn_loss.py:12-20)
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
):
    """RCNN stage loss (reference rcnn_loss.py:27-134). All shipped configs
    use BinaryCrossEntropy; SigmoidFocalLoss is registry-reachable (the
    reference's CrossEntropy branch references an undefined `cls_valid_mask`
    — a latent NameError — so it is intentionally not reproduced). The
    reference has NO corner loss (grep: none in rcnn_loss.py/loss_utils.py,
    unlike upstream PointRCNN)."""
    p = jax.nn.sigmoid(cls_pred)
    t = (cls_label > 0).astype(p.dtype)
    care = (cls_label >= 0).astype(p.dtype)
    if loss_cls == "SigmoidFocalLoss":
        # reference: weights = (pos+neg)/clamp(pos.sum(), 1); loss.sum()
        # (rcnn_loss.py:57-72) — normalized by foreground count
        from ...ops.losses import sigmoid_focal_loss_binary

        raw = sigmoid_focal_loss_binary(cls_pred, t, focal_gamma, focal_alpha)
        cls_l = jnp.sum(raw * care) / jnp.maximum(jnp.sum(t * care), 1.0)
    else:  # BinaryCrossEntropy (rcnn_loss.py:74-79)
        bce = -(t * jnp.log(jnp.clip(p, 1e-12)) + (1 - t) * jnp.log(jnp.clip(1 - p, 1e-12)))
        cls_l = jnp.sum(bce * care) / jnp.maximum(jnp.sum(care), 1.0)
    loc, angle, size = codec.reg_loss(
        reg_pred, gt_ct, reg_mask.astype(p.dtype), anchor_size, RCNN_CODEC
    )
    return cls_l + loc + angle + 3.0 * size  # size x3: rcnn_loss.py:118


def rcnn_postprocess(
    cls_pred: jnp.ndarray,  # (R, M)
    reg_pred: jnp.ndarray,  # (R, M, C)
    rois: jnp.ndarray,  # (R, M, 7)
    roi_valid: jnp.ndarray,  # (R, M)
    roi_scores: jnp.ndarray,  # (R, M) rpn proposal scores
    anchor_size: jnp.ndarray,
    score_thresh: float = 0.1,
):
    """-> (box3d (R, 7), score (R,), is_random (R,)).

    Decodes canonically against each roi, then per instance keeps the
    highest-scoring refined box above threshold; if none, falls back to the
    best RPN proposal with the `random` flag set (rcnn_inference.py:66-105 +
    point_rcnn.combine_2d_3d argmax).
    """
    r, m = cls_pred.shape
    flat_rois = rois.reshape(-1, 7)
    boxes = codec.decode(
        flat_rois[:, 0:3], reg_pred.reshape(r * m, -1), anchor_size, RCNN_CODEC,
        base_ry=flat_rois[:, 6],
    ).reshape(r, m, 7)
    norm = jax.nn.sigmoid(cls_pred)
    ok = (norm > score_thresh) & roi_valid

    def per_instance(b, s_raw, o, roi, rpn_s, rv):
        any_ok = jnp.any(o)
        best = jnp.argmax(jnp.where(o, s_raw, -1e10))
        fallback = jnp.argmax(jnp.where(rv, rpn_s, -1e10))
        box = jnp.where(any_ok, b[best], roi[fallback])
        score = jnp.where(any_ok, s_raw[best], 0.0)
        return box, score, ~any_ok

    return jax.vmap(per_instance)(boxes, cls_pred, ok, rois, roi_scores, roi_valid)
