"""Box overlap ops: axis-aligned 2D IoU, rotated BEV IoU, and 3D IoU.

Pure-XLA, fixed-shape formulations of the reference's overlap computations:
- 2D IoU with the legacy ``+1`` pixel convention
  (reference: disprcnn/structures/boxlist_ops.py:130-132, csrc/cuda/nms.cu devIoU).
- Rotated BEV rectangle intersection via vectorized vertex enumeration
  (reference: pointnet_module/.../iou3d/src/iou3d_kernel.cu polygon clipping).
- 3D IoU = BEV overlap x vertical extent overlap
  (reference: .../iou3d/iou3d_utils.py:23-57 boxes_iou3d_gpu).

All shapes are static; invalid/padded boxes are handled by the caller masking
rows/columns of the returned matrices.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray, to_remove: float = 1.0) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes with the reference's +1 convention."""
    wh = jnp.maximum(boxes[..., 2:4] - boxes[..., 0:2] + to_remove, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, to_remove: float = 1.0) -> jnp.ndarray:
    """IoU matrix between (N,4) and (M,4) xyxy boxes -> (N,M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt + to_remove, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a, to_remove)[:, None] + box_area(b, to_remove)[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


# ----------------------------------------------------------------------------
# Rotated BEV rectangles.
# A BEV box is (x1, y1, x2, y2, ry): the axis-aligned rect rotated by ry about
# its own center (reference kitti_utils.boxes3d_to_bev_torch:113-126).
# ----------------------------------------------------------------------------


def bev_corners(bev: jnp.ndarray) -> jnp.ndarray:
    """Corners (..., 4, 2) of BEV boxes (..., 5) = (x1,y1,x2,y2,ry)."""
    cx = (bev[..., 0] + bev[..., 2]) * 0.5
    cy = (bev[..., 1] + bev[..., 3]) * 0.5
    hw = (bev[..., 2] - bev[..., 0]) * 0.5
    hh = (bev[..., 3] - bev[..., 1]) * 0.5
    ry = bev[..., 4]
    c, s = jnp.cos(ry), jnp.sin(ry)
    # local corner offsets, counter-clockwise
    dx = jnp.stack([hw, -hw, -hw, hw], axis=-1)
    dy = jnp.stack([hh, hh, -hh, -hh], axis=-1)
    x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return jnp.stack([x, y], axis=-1)


def _point_in_rect(pts: jnp.ndarray, bev: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """pts (..., K, 2) inside rect bev (..., 5) -> bool (..., K)."""
    cx = (bev[..., 0] + bev[..., 2]) * 0.5
    cy = (bev[..., 1] + bev[..., 3]) * 0.5
    hw = (bev[..., 2] - bev[..., 0]) * 0.5
    hh = (bev[..., 3] - bev[..., 1]) * 0.5
    ry = bev[..., 4]
    c, s = jnp.cos(ry), jnp.sin(ry)
    px = pts[..., 0] - cx[..., None]
    py = pts[..., 1] - cy[..., None]
    # rotate into box frame (inverse rotation)
    u = px * c[..., None] + py * s[..., None]
    v = -px * s[..., None] + py * c[..., None]
    return (jnp.abs(u) <= hw[..., None] + eps) & (jnp.abs(v) <= hh[..., None] + eps)


def _seg_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-pair intersection points between two quads.

    ca, cb: (..., 4, 2) corner rings. Returns points (..., 16, 2) and a validity
    mask (..., 16).
    """
    a0 = ca
    a1 = jnp.roll(ca, -1, axis=-2)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=-2)
    # broadcast edge pairs: (..., 4, 1, 2) x (..., 1, 4, 2)
    p, r = a0[..., :, None, :], (a1 - a0)[..., :, None, :]
    q, s = b0[..., None, :, :], (b1 - b0)[..., None, :, :]

    def cross(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    denom = cross(r, s)
    qp = q - p
    t = cross(qp, s) / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    u = cross(qp, r) / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    ok = (jnp.abs(denom) >= 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p + t[..., None] * r
    flat = lambda x: x.reshape(x.shape[:-3] + (16,) + x.shape[-1:])
    return flat(pts), ok.reshape(ok.shape[:-2] + (16,))


def rotated_rect_intersection_area(bev_a: jnp.ndarray, bev_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two batches of rotated rects, elementwise.

    bev_a, bev_b: (..., 5). Returns (...,). Vectorized vertex-enumeration:
    candidate vertices = corners-of-A-in-B + corners-of-B-in-A + edge
    intersections (24 fixed slots), angle-sorted about their centroid, shoelace.
    """
    ca, cb = bev_corners(bev_a), bev_corners(bev_b)
    in_b = _point_in_rect(ca, bev_b)  # (..., 4)
    in_a = _point_in_rect(cb, bev_a)  # (..., 4)
    xpts, xok = _seg_intersections(ca, cb)  # (..., 16, 2), (..., 16)

    pts = jnp.concatenate([ca, cb, xpts], axis=-2)  # (..., 24, 2)
    ok = jnp.concatenate([in_b, in_a, xok], axis=-1)  # (..., 24)

    nv = jnp.sum(ok, axis=-1)
    okf = ok[..., None].astype(pts.dtype)
    centroid = jnp.sum(pts * okf, axis=-2) / jnp.maximum(nv, 1)[..., None]

    ang = jnp.arctan2(pts[..., 1] - centroid[..., None, 1], pts[..., 0] - centroid[..., None, 0])
    big = jnp.asarray(1e9, ang.dtype)
    ang = jnp.where(ok, ang, big)  # invalid slots order last
    # TPU-friendly ordering: XLA's variadic sort is very slow at this batch
    # scale (millions of 24-element rows), so compute each element's rank by
    # comparison counting (24x24 VPU compares) and permute via a one-hot
    # matmul instead of argsort+gather.
    i_idx = jnp.arange(24)
    less = (ang[..., None, :] < ang[..., :, None]) | (
        (ang[..., None, :] == ang[..., :, None]) & (i_idx[None, :] < i_idx[:, None])
    )
    rank = jnp.sum(less, axis=-1)  # (..., 24) strict total order; invalid last
    # shoelace via ring adjacency: points i -> j are consecutive iff
    # rank_j == (rank_i + 1) mod n_valid. Pure elementwise + reduction — fuses
    # on TPU without materializing per-pair permutation matrices.
    nv_safe = jnp.maximum(nv, 1)[..., None, None]
    succ = (rank[..., :, None] + 1) % nv_safe == rank[..., None, :]
    adj = succ & ok[..., :, None] & ok[..., None, :]
    x, y = pts[..., 0], pts[..., 1]
    cross = x[..., :, None] * y[..., None, :] - y[..., :, None] * x[..., None, :]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(adj, cross, 0.0), axis=(-2, -1)))
    return jnp.where(nv >= 3, area, 0.0)


def pairwise_bev_overlap(bev_a: jnp.ndarray, bev_b: jnp.ndarray) -> jnp.ndarray:
    """(N,5) x (M,5) -> (N,M) rotated intersection areas."""
    a = jnp.broadcast_to(bev_a[:, None, :], (bev_a.shape[0], bev_b.shape[0], 5))
    b = jnp.broadcast_to(bev_b[None, :, :], (bev_a.shape[0], bev_b.shape[0], 5))
    return rotated_rect_intersection_area(a, b)


def pairwise_bev_iou(bev_a: jnp.ndarray, bev_b: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV IoU matrix (N,M)."""
    inter = pairwise_bev_overlap(bev_a, bev_b)
    area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area(bev_a)[:, None] + area(bev_b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-7)


def boxes3d_to_bev(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(N,7) [x,y,z,h,w,l,ry] -> BEV (N,5) [x1,y1,x2,y2,ry].

    x/z plane; half-length along x, half-width along z
    (reference kitti_utils.boxes3d_to_bev_torch:113-126).
    """
    cu, cv = boxes3d[..., 0], boxes3d[..., 2]
    half_l, half_w = boxes3d[..., 5] / 2, boxes3d[..., 4] / 2
    return jnp.stack(
        [cu - half_l, cv - half_w, cu + half_l, cv + half_w, boxes3d[..., 6]], axis=-1
    )


def pairwise_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """3D IoU of (N,7) x (M,7) [x,y,z,h,w,l,ry] boxes (camera frame, y down).

    BEV overlap x height overlap over union of volumes
    (reference iou3d_utils.boxes_iou3d_gpu:23-57).
    """
    overlaps_bev = pairwise_bev_overlap(boxes3d_to_bev(boxes_a), boxes3d_to_bev(boxes_b))
    a_ymin = (boxes_a[:, 1] - boxes_a[:, 3])[:, None]
    a_ymax = boxes_a[:, 1][:, None]
    b_ymin = (boxes_b[:, 1] - boxes_b[:, 3])[None, :]
    b_ymax = boxes_b[:, 1][None, :]
    overlaps_h = jnp.maximum(
        jnp.minimum(a_ymax, b_ymax) - jnp.maximum(a_ymin, b_ymin), 0.0
    )
    inter3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter3d / jnp.maximum(vol_a + vol_b - inter3d, 1e-7)
