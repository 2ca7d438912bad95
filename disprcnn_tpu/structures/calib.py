"""Stereo camera calibration as a pytree.

Replaces the reference's Calibration / Calib wrappers
(utils/kitti_utils.py:12-384, structures/calib.py:10-215) with a functional
dataclass carrying the left/right projection matrices. All projection math is
jnp and vmappable; crop/resize return adjusted copies.

Key identity: ``stereo_baseline`` = P2[0,3] - P3[0,3] = fu * baseline_meters,
so depth = stereo_baseline / disparity (utils/kitti_utils.py:66-68, 238-241).
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class Calib:
    P2: jnp.ndarray  # (3, 4) left color cam projection
    P3: jnp.ndarray  # (3, 4) right color cam projection
    size: Tuple[int, int] = flax.struct.field(pytree_node=False)  # (width, height)

    # -- intrinsics --------------------------------------------------------
    @property
    def fu(self):
        return self.P2[..., 0, 0]

    @property
    def fv(self):
        return self.P2[..., 1, 1]

    @property
    def cu(self):
        return self.P2[..., 0, 2]

    @property
    def cv(self):
        return self.P2[..., 1, 2]

    @property
    def tx(self):
        return self.P2[..., 0, 3] / (-self.fu)

    @property
    def ty(self):
        return self.P2[..., 1, 3] / (-self.fv)

    @property
    def stereo_baseline(self):
        """fu x baseline (pixel-meters): depth = stereo_baseline / disparity."""
        return self.P2[..., 0, 3] - self.P3[..., 0, 3]

    @property
    def width(self):
        return self.size[0]

    @property
    def height(self):
        return self.size[1]

    # -- projections -------------------------------------------------------
    def img_to_rect(self, u, v, depth):
        """Pixel coords + depth -> rect-frame points (..., 3)
        (utils/kitti_utils.py:196-212)."""
        x = (u - self.cu) * depth / self.fu + self.tx
        y = (v - self.cv) * depth / self.fv + self.ty
        return jnp.stack([x, y, depth], axis=-1)

    def rect_to_img(self, pts):
        """(..., 3) rect points -> ((..., 2) pixels, (...,) depth)
        (utils/kitti_utils.py:141-158)."""
        hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
        # full precision: TPU matmuls default to bf16 inputs, which is too
        # coarse for pixel-accurate projection
        img = jnp.matmul(hom, self.P2.T, precision=jax.lax.Precision.HIGHEST)
        # reference divides by the input z, NOT the homogeneous w (which
        # differs by P2[2,3]): utils/kitti_utils.py:149-150
        uv = img[..., :2] / pts[..., 2:3]
        depth = img[..., 2] - self.P2[2, 3]
        return uv, depth

    def disparity_to_depth(self, disp, epsilon: float = 1e-6):
        return self.stereo_baseline / (disp + epsilon)

    def depth_to_disparity(self, depth, epsilon: float = 1e-6):
        return self.stereo_baseline / (depth + epsilon)

    def depth_map_to_rect(self, depth_map: jnp.ndarray) -> jnp.ndarray:
        """(H, W) depth -> (H*W, 3) rect points, row-major pixel order
        (utils/kitti_utils.py:214-231)."""
        h, w = depth_map.shape
        v, u = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        return self.img_to_rect(
            u.reshape(-1).astype(depth_map.dtype),
            v.reshape(-1).astype(depth_map.dtype),
            depth_map.reshape(-1),
        )

    # -- geometric adjustments --------------------------------------------
    def crop(self, box) -> "Calib":
        """Shift principal points by the crop origin (utils/kitti_utils.py:336-347)."""
        x1, y1, x2, y2 = box
        shift = jnp.zeros((3, 4)).at[0, 2].set(x1).at[1, 2].set(y1)
        return Calib(
            P2=self.P2 - shift, P3=self.P3 - shift, size=(int(x2 - x1), int(y2 - y1))
        )

    def resize(self, dst_size: Tuple[int, int]) -> "Calib":
        """Scale rows 0/1 by the size ratio (utils/kitti_utils.py:348-366)."""
        w, h = dst_size
        scale = jnp.asarray([w / self.width, h / self.height, 1.0])[:, None]
        return Calib(P2=self.P2 * scale, P3=self.P3 * scale, size=(int(w), int(h)))
