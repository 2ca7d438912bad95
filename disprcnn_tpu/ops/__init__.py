from .iou import (
    box_area,
    boxes3d_to_bev,
    bev_corners,
    pairwise_bev_iou,
    pairwise_bev_overlap,
    pairwise_iou,
    pairwise_iou3d,
    rotated_rect_intersection_area,
)
from .losses import (
    dice_loss,
    masked_epe,
    psm_deep_supervision_loss,
    sigmoid_focal_loss,
    sigmoid_focal_loss_binary,
    smooth_l1,
    smooth_l1_loss,
)
from .nms import (
    batched_class_nms_mask,
    bev_nms_mask,
    bev_nms_topk,
    double_view_nms_mask,
    double_view_nms_topk,
    nms_mask,
    nms_topk,
    topk_after_nms,
)
from .points import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
    three_nn_interpolate_weights,
)
from .roi_align import roi_align, roi_align_batched, roi_pool
from .roipool3d import enlarge_box3d, pts_in_boxes3d, roipool3d
