"""Instance mask ops: fixed-shape paste-in-image (Masker) and ROI crops.

The reference Masker (roi_heads/mask_head/inference.py:108-201) pads each M x M
mask logit map by 1 px, scales the box accordingly, bilinear-resizes to the
integer box size, thresholds at 0.5, and pastes. The TPU formulation inverts
the mapping: for every image pixel, compute its source coordinate in the
padded mask and gather — one batched op over (N, H, W), no per-instance host
loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sample_bilinear_2d(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) at float coords with border clamping (align_corners=False
    interior behaviour of torch interpolate)."""
    h, w = img.shape
    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2) if h > 1 else jnp.zeros_like(y, jnp.int32)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2) if w > 1 else jnp.zeros_like(x, jnp.int32)
    y1, x1 = jnp.minimum(y0 + 1, h - 1), jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    v = (
        img[y0, x0] * (1 - ly) * (1 - lx)
        + img[y0, x1] * (1 - ly) * lx
        + img[y1, x0] * ly * (1 - lx)
        + img[y1, x1] * ly * lx
    )
    return v


def paste_mask_in_image(
    mask: jnp.ndarray,  # (M, M) probabilities
    box: jnp.ndarray,  # (4,) xyxy float
    im_h: int,
    im_w: int,
    thresh: float = 0.5,
    padding: int = 1,
) -> jnp.ndarray:
    """One mask -> (im_h, im_w) bool, reference expand+resize+paste semantics."""
    m = mask.shape[-1]
    padded = jnp.pad(mask, padding)
    scale = (m + 2 * padding) / m
    # expand box about its center by `scale` (inference.py expand_boxes)
    cx, cy = (box[0] + box[2]) * 0.5, (box[1] + box[3]) * 0.5
    hw, hh = (box[2] - box[0]) * 0.5 * scale, (box[3] - box[1]) * 0.5 * scale
    bx0 = jnp.floor(cx - hw).astype(jnp.int32)  # int cast, matching .to(int32)
    by0 = jnp.floor(cy - hh).astype(jnp.int32)
    bx1 = jnp.floor(cx + hw).astype(jnp.int32)
    by1 = jnp.floor(cy + hh).astype(jnp.int32)
    bw = jnp.maximum(bx1 - bx0 + 1, 1)
    bh = jnp.maximum(by1 - by0 + 1, 1)

    ys = jnp.arange(im_h)
    xs = jnp.arange(im_w)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    # inverse align_corners=False mapping: src = (dst + .5) * (S/D) - .5
    src_y = (yy - by0 + 0.5) * ((m + 2 * padding) / bh) - 0.5
    src_x = (xx - bx0 + 0.5) * ((m + 2 * padding) / bw) - 0.5
    vals = _sample_bilinear_2d(padded, src_y, src_x)
    inside = (yy >= by0) & (yy <= by1) & (xx >= bx0) & (xx <= bx1)
    return inside & (vals > thresh)


@partial(jax.jit, static_argnames=("im_h", "im_w", "thresh", "padding"))
def paste_masks_in_image(
    masks: jnp.ndarray,  # (N, M, M)
    boxes: jnp.ndarray,  # (N, 4)
    valid: jnp.ndarray,  # (N,)
    im_h: int,
    im_w: int,
    thresh: float = 0.5,
    padding: int = 1,
) -> jnp.ndarray:
    """Batched paste -> (N, im_h, im_w) bool; invalid rows come back empty."""
    out = jax.vmap(lambda mk, b: paste_mask_in_image(mk, b, im_h, im_w, thresh, padding))(
        masks, boxes
    )
    return out & valid[:, None, None]


def crop_and_resize_mask(
    full_mask: jnp.ndarray,  # (H, W) float or bool
    box: jnp.ndarray,  # (4,) xyxy
    out_size: int,
) -> jnp.ndarray:
    """Crop a full-image mask to a box and resize to out_size^2 (used to build
    ROI mask targets, reference mask_head/loss.py project_masks_on_boxes)."""
    h, w = full_mask.shape
    ys = (jnp.arange(out_size) + 0.5) / out_size
    xs = (jnp.arange(out_size) + 0.5) / out_size
    yy = box[1] + ys[:, None] * (box[3] - box[1]) - 0.5
    xx = box[0] + xs[None, :] * (box[2] - box[0]) - 0.5
    yy = jnp.broadcast_to(yy, (out_size, out_size))
    xx = jnp.broadcast_to(xx, (out_size, out_size))
    return _sample_bilinear_2d(full_mask.astype(jnp.float32), yy, xx)
