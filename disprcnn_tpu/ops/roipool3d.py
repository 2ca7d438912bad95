"""3D ROI pooling: point-in-rotated-3D-box tests + fixed-size point sampling.

Fixed-shape XLA equivalent of the reference roipool3d CUDA extension
(.../roipool3d/src/roipool3d_kernel.cu:15-100):
- box = (cx, bottom_y, cz, h, w, l, ry), y-down camera frame, center y at
  bottom_y - h/2, quick-reject at |dx|,|dz| > 10 m,
- in-box test in the box's canonical frame: |x_rot| <= l/2, |z_rot| <= w/2,
  |y - cy| <= h/2,
- per box: the FIRST `sampled_pts_num` in-box points in scan order, tail slots
  cycling through the found points (k % cnt), plus an empty flag.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pts_in_boxes3d(pts: jnp.ndarray, boxes3d: jnp.ndarray, max_dis: float = 10.0) -> jnp.ndarray:
    """(N, 3) points x (M, 7) boxes -> bool (M, N)."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    cx, by, cz = boxes3d[:, 0:1], boxes3d[:, 1:2], boxes3d[:, 2:3]
    h, w, l, ry = boxes3d[:, 3:4], boxes3d[:, 4:5], boxes3d[:, 5:6], boxes3d[:, 6:7]
    cy = by - h / 2.0
    dx = x[None, :] - cx
    dy = y[None, :] - cy
    dz = z[None, :] - cz
    near = (jnp.abs(dx) <= max_dis) & (jnp.abs(dy) <= h / 2.0) & (jnp.abs(dz) <= max_dis)
    cosa, sina = jnp.cos(ry), jnp.sin(ry)
    x_rot = dx * cosa - dz * sina
    z_rot = dx * sina + dz * cosa
    inside = (
        (x_rot >= -l / 2.0)
        & (x_rot <= l / 2.0)
        & (z_rot >= -w / 2.0)
        & (z_rot <= w / 2.0)
    )
    return near & inside


def _first_k_cycled_rows(mask: jnp.ndarray, k: int):
    """Indices of the first k True entries per row (scan order), tail cycling
    (slot % cnt). mask (R, N) -> (idx (R, k), cnt (R,)). All-False rows give
    zeros. Selection via ops.points.first_k_true (sort-free: a per-row sort
    of the masked iota costs a full (R, N) sort on TPU)."""
    from .points import first_k_true

    cand, cnt = first_k_true(mask, k)
    slot = jnp.arange(k)[None, :]
    sel = jnp.where(slot < cnt[:, None], slot,
                    slot % jnp.maximum(cnt[:, None], 1))
    out = jnp.take_along_axis(cand, sel, axis=1)
    return jnp.where(cnt[:, None] > 0, out, 0).astype(jnp.int32), cnt


def _gather_onehot_hilo(pts: jnp.ndarray, feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B,N,3) f32, (B,N,C), (B,M,S) -> (B,M,S,3+C) via ONE bf16 one-hot gather.

    idx-one-hot MXU gather (ops/points.group_points): the vmapped fancy-index
    gather lowers to per-row slices — measured 3.1 ms vs ~0.5 ms for the
    contraction at the (16, 16 rois, 768 pts, 512 samples) geometry. One
    gather for xyz+feats: separate f32/bf16 gathers each build their own
    1.07G-element one-hot operand (XLA does not CSE across dtypes). f32
    values ride as a bf16 hi/lo pair (hi = round(x), lo = x - hi, both
    exactly representable, and a one-hot contraction reproduces them
    exactly), recombined in f32: ~16 mantissa bits, relative error ~2^-17 —
    well under the geometry tolerances downstream."""
    from .points import group_points

    full = jnp.concatenate([pts, feats.astype(pts.dtype)], axis=-1)
    hi = full.astype(jnp.bfloat16)
    lo = (full - hi.astype(full.dtype)).astype(jnp.bfloat16)
    g = group_points(jnp.concatenate([hi, lo], axis=-1), idx)
    c = full.shape[-1]
    return g[..., :c].astype(full.dtype) + g[..., c:].astype(full.dtype)


@partial(jax.jit, static_argnames=("sampled_pts_num",
                                   "f32_feat_channels"))
def roipool3d(
    pts: jnp.ndarray,  # (B, N, 3)
    feats: jnp.ndarray,  # (B, N, C)
    boxes3d: jnp.ndarray,  # (B, M, 7)
    sampled_pts_num: int = 512,
    f32_feat_channels=None,
):
    """-> pooled (B, M, S, 3 + C), empty_flag (B, M) bool.

    f32_feat_channels: static tuple of feats channels that are NOT exactly
    bf16-representable (None = all) — lets the fused kernel keep its
    one-hot gather dot in bf16 at the minimal lane count (exact either
    way; see ops/pallas/roipool3d_fused._kernel)."""

    from .pallas import kernel_disabled

    bsz, n = pts.shape[0], pts.shape[1]
    m = boxes3d.shape[1]
    if jax.default_backend() == "tpu" and not kernel_disabled("roipool"):
        # fused Pallas path: mask + first-k-cycled one-hot + f32 gather in
        # VMEM (ops/pallas/roipool3d_fused.py); slightly MORE accurate than
        # the hi/lo gather below (full f32)
        from .pallas.roipool3d_fused import roipool3d_fused

        return roipool3d_fused(pts, feats, boxes3d, sampled_pts_num,
                               f32_channels=f32_feat_channels)
    mask = jax.vmap(pts_in_boxes3d)(pts, boxes3d)  # (B, M, N)
    idx, cnt = _first_k_cycled_rows(mask.reshape(bsz * m, n), sampled_pts_num)
    idx = idx.reshape(bsz, m, sampled_pts_num)
    cnt = cnt.reshape(bsz, m)
    if jax.default_backend() == "tpu":
        pooled = _gather_onehot_hilo(pts, feats, idx)
    else:

        def per_batch(p, f, i):
            full = jnp.concatenate([p, f], axis=-1)  # (N, 3+C)
            return full[i]  # (M, S, 3+C)

        pooled = jax.vmap(per_batch)(pts, feats, idx)
    empty = cnt == 0
    pooled = jnp.where(empty[:, :, None, None], 0.0, pooled)
    return pooled, empty


def enlarge_box3d(boxes3d: jnp.ndarray, extra_width: float) -> jnp.ndarray:
    """Grow h/w/l by 2*extra_width, shift bottom y down by extra_width
    (reference kitti_utils.enlarge_box3d:129-136)."""
    return boxes3d.at[..., 3:6].add(extra_width * 2).at[..., 1].add(extra_width)
