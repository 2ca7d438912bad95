"""3D box parameterizations and conversions (pytree replacement of Box3DList).

Modes follow the reference (structures/bounding_box_3d.py:81-190):
- ``xyzhwl_ry`` (N, 7): bottom-center xyz, h, w, l, yaw — the working format.
- ``ry_lhwxyz`` (N, 7): permutation of the same.
- ``corners`` (N, 8, 3): rect-camera-frame corners; corner 0 = (-l/2, 0, w/2)
  in the object frame, y-down, rotation R_y(ry) = [[c,0,s],[0,1,0],[-s,0,c]].

All functions are shape-preserving jnp ops usable under jit/vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ry_lhwxyz_to_xyzhwl_ry(b: jnp.ndarray) -> jnp.ndarray:
    ry, l, h, w = b[..., 0:1], b[..., 1:2], b[..., 2:3], b[..., 3:4]
    xyz = b[..., 4:7]
    return jnp.concatenate([xyz, h, w, l, ry], axis=-1)


def xyzhwl_ry_to_ry_lhwxyz(b: jnp.ndarray) -> jnp.ndarray:
    xyz, h, w, l, ry = b[..., 0:3], b[..., 3:4], b[..., 4:5], b[..., 5:6], b[..., 6:7]
    return jnp.concatenate([ry, l, h, w, xyz], axis=-1)


def corners_from_xyzhwl_ry(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3) rect-frame corners (bounding_box_3d.py:146-166).

    xyz is the BOTTOM center (y down); top face at y - h.
    """
    x, y, z = b[..., 0], b[..., 1], b[..., 2]
    h, w, l, ry = b[..., 3], b[..., 4], b[..., 5], b[..., 6]
    zero = jnp.zeros_like(h)
    xc = jnp.stack([-l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2], -1)
    yc = jnp.stack([zero, -h, -h, zero, zero, -h, -h, zero], -1)
    zc = jnp.stack([w / 2, w / 2, w / 2, w / 2, -w / 2, -w / 2, -w / 2, -w / 2], -1)
    c, s = jnp.cos(ry), jnp.sin(ry)
    # R_y(ry) @ [xc, yc, zc]
    xr = c[..., None] * xc + s[..., None] * zc
    zr = -s[..., None] * xc + c[..., None] * zc
    corners = jnp.stack(
        [xr + x[..., None], yc + y[..., None], zr + z[..., None]], axis=-1
    )
    return corners


def xyzhwl_ry_from_corners(corners: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 3) -> (..., 7), inverting the layout above
    (bounding_box_3d.py convert:93-108; ry from corner3 - corner0)."""
    c0, c1, c3, c4, c7 = (
        corners[..., 0, :],
        corners[..., 1, :],
        corners[..., 3, :],
        corners[..., 4, :],
        corners[..., 7, :],
    )
    dif = c3 - c0
    ry = -jnp.arctan2(dif[..., 2], dif[..., 0])
    xyz = (c7 + c0) / 2.0
    l = jnp.linalg.norm(c0 - c3, axis=-1)
    h = jnp.linalg.norm(c0 - c1, axis=-1)
    w = jnp.linalg.norm(c0 - c4, axis=-1)
    return jnp.concatenate(
        [xyz, h[..., None], w[..., None], l[..., None], ry[..., None]], axis=-1
    )


def center_from_xyzhwl_ry(b: jnp.ndarray) -> jnp.ndarray:
    """Geometric center (xyz is bottom-center, y down)."""
    return b[..., 0:3] - jnp.stack(
        [jnp.zeros_like(b[..., 3]), b[..., 3] / 2, jnp.zeros_like(b[..., 3])], -1
    ) * jnp.asarray([0.0, 1.0, 0.0])


def project_corners_to_img(
    corners: jnp.ndarray, p2: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project (..., 8, 3) rect corners through P2 (3, 4) -> 2D boxes.

    Returns (boxes (..., 4) xyxy, depths (..., 8)), following the reference
    Calibration.corners3d_to_img_boxes (utils/kitti_utils.py:248-280).
    """
    hom = jnp.concatenate([corners, jnp.ones_like(corners[..., :1])], axis=-1)
    img = jnp.matmul(hom, p2.T, precision=jax.lax.Precision.HIGHEST)  # (..., 8, 3)
    uv = img[..., :2] / img[..., 2:3]
    x1 = jnp.min(uv[..., 0], axis=-1)
    y1 = jnp.min(uv[..., 1], axis=-1)
    x2 = jnp.max(uv[..., 0], axis=-1)
    y2 = jnp.max(uv[..., 1], axis=-1)
    return jnp.stack([x1, y1, x2, y2], axis=-1), img[..., 2]


def corners_from_xyzhwl_ry_velodyne(b: jnp.ndarray) -> jnp.ndarray:
    """Velodyne-frame corners (z up): layout of bounding_box_3d.py:124-144.

    Corner y in {±w/2}, z in {0, h}, x in {±l/2}; rotation
    R_z(ry) = [[c,-s,0],[s,c,0],[0,0,1]].
    """
    x, y, z = b[..., 0], b[..., 1], b[..., 2]
    h, w, l, ry = b[..., 3], b[..., 4], b[..., 5], b[..., 6]
    zero = jnp.zeros_like(h)
    xc = jnp.stack([-l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2], -1)
    yc = jnp.stack([w / 2, w / 2, w / 2, w / 2, -w / 2, -w / 2, -w / 2, -w / 2], -1)
    zc = jnp.stack([zero, h, h, zero, zero, h, h, zero], -1)
    c, s = jnp.cos(ry), jnp.sin(ry)
    xr = c[..., None] * xc - s[..., None] * yc
    yr = s[..., None] * xc + c[..., None] * yc
    return jnp.stack(
        [xr + x[..., None], yr + y[..., None], zc + z[..., None]], axis=-1
    )


def filter_fov_points(pts: jnp.ndarray, p2: jnp.ndarray, image_wh) -> jnp.ndarray:
    """Mask of rect-frame points projecting inside the image with depth >= 0
    (reference utils/kitti_utils.py:368-375 filter_fov_pts)."""
    hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    img = jnp.matmul(hom, p2.T, precision=jax.lax.Precision.HIGHEST)
    uv = img[..., :2] / pts[..., 2:3]
    w, h = image_wh
    return (
        (uv[..., 0] >= 0) & (uv[..., 0] < w)
        & (uv[..., 1] >= 0) & (uv[..., 1] < h)
        & (img[..., 2] - p2[2, 3] >= 0)
    )


def rotate_points_along_y(pts: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., N, 3) points about the camera y-axis by (...,) angles.

    Matches reference kitti_utils.rotate_pc_along_y_torch:18-36: the (x, z) row
    vector is right-multiplied by R^T with R = [[c, -s], [s, c]], i.e.
    x' = x c - z s, z' = x s + z c.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, z = pts[..., 0], pts[..., 2]
    xn = x * c[..., None] - z * s[..., None]
    zn = x * s[..., None] + z * c[..., None]
    return jnp.stack([xn, pts[..., 1], zn], axis=-1)
