from .boxes import Boxes2D, pad_boxes, union_box
from .boxes3d import (
    corners_from_xyzhwl_ry,
    project_corners_to_img,
    rotate_points_along_y,
    ry_lhwxyz_to_xyzhwl_ry,
    xyzhwl_ry_from_corners,
    xyzhwl_ry_to_ry_lhwxyz,
)
from .calib import Calib
from .disparity import crop_disparity, resize_disparity, shift_disparity
from .image_list import ImageBatch, to_image_batch
from .masks import crop_and_resize_mask, paste_mask_in_image, paste_masks_in_image
