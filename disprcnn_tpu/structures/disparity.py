"""Disparity map semantics: resizing rescales VALUES by the width ratio.

Disparity is width-proportional, so a spatial resize must also scale the
disparity values (reference structures/disparity.py:12-90, value rescale at
line 60). Functions operate on (H, W) or batched (..., H, W) arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_disparity(disp: jnp.ndarray, dst_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (..., H, W) disparity to (..., h', w'), with the
    values multiplied by w'/W."""
    h, w = disp.shape[-2], disp.shape[-1]
    out = jax.image.resize(disp, disp.shape[:-2] + tuple(dst_hw), method="bilinear")
    return out * (dst_hw[1] / w)


def crop_disparity(disp: jnp.ndarray, box) -> jnp.ndarray:
    """Static crop (x1, y1, x2, y2) of an (H, W) map; values unchanged
    (reference DisparityMap.crop)."""
    x1, y1, x2, y2 = (int(v) for v in box)
    return disp[..., y1:y2, x1:x2]


def shift_disparity(disp: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Add the left/right crop x-offset (x1 - x1') used when converting
    full-image disparity to ROI disparity (reference
    tools/kitti_object/generate_psmnet_input_inf.py and psmnet/inference.py)."""
    return disp + offset
