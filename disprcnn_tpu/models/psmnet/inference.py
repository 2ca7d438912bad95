"""iDispNet postprocessing: reassemble ROI disparities into full-image maps.

Reference: modeling/psmnet/inference.py:18-107 (DisparityMapProcessor):
each ROI's predicted disparity crop is resized to its box size (value
rescale), shifted by x1 - x1', masked by the instance mask, and the
per-instance maps are combined by max. Fixed-shape: one vectorized inverse
gather over the output image instead of per-ROI paste loops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..pointrcnn.lift import _bilinear, expand_box_to_integer


@partial(jax.jit, static_argnames=("im_h", "im_w"))
def rois_to_fullimage_disparity(
    disp_roi: jnp.ndarray,  # (R, S, S)
    masks: jnp.ndarray,  # (R, M, M) probabilities
    left_boxes: jnp.ndarray,  # (R, 4)
    right_boxes: jnp.ndarray,  # (R, 4)
    valid: jnp.ndarray,  # (R,)
    im_h: int,
    im_w: int,
    mask_thresh: float = 0.5,
) -> jnp.ndarray:
    """-> (im_h, im_w) full-image instance disparity (max over instances)."""
    s = disp_roi.shape[-1]
    ys = jnp.arange(im_h, dtype=jnp.float32)
    xs = jnp.arange(im_w, dtype=jnp.float32)
    yy = jnp.broadcast_to(ys[:, None], (im_h, im_w))
    xx = jnp.broadcast_to(xs[None, :], (im_h, im_w))

    def per_roi(d, mk, lb, rb, ok):
        li = expand_box_to_integer(lb)
        ri = expand_box_to_integer(rb)
        w = li[2] - li[0]
        h = li[3] - li[1]
        wmax = jnp.maximum(w, ri[2] - ri[0])
        sy = (yy - li[1]) / jnp.maximum(h, 1.0) * s - 0.5
        sx = (xx - li[0]) / jnp.maximum(wmax, 1.0) * s - 0.5
        vals = _bilinear(d, sy, sx) * (wmax / s) + (li[0] - ri[0])
        m = mk.shape[-1]
        my = (yy - lb[1]) / jnp.maximum(lb[3] - lb[1], 1.0) * m - 0.5
        mx = (xx - lb[0]) / jnp.maximum(lb[2] - lb[0], 1.0) * m - 0.5
        mval = _bilinear(mk, my, mx) > mask_thresh
        inside = (yy >= li[1]) & (yy < li[3]) & (xx >= li[0]) & (xx < li[2])
        return jnp.where(inside & mval & ok, vals, -jnp.inf)

    per = jax.vmap(per_roi)(disp_roi, masks, left_boxes, right_boxes, valid)
    out = jnp.max(per, axis=0)
    return jnp.where(jnp.isfinite(out), out, 0.0)
