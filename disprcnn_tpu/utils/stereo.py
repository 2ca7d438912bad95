"""Stereo geometry utilities (reference utils/stereo_utils.py:10-229).

- expand_left_right_box: union box of an L/R pair + the original pair
  (used by SRPN loss matching) — see structures.boxes.union_box / box6.
- DisparityWarping: warp the right image into the left view with a dense
  disparity map (bilinear grid sample, zero padding).
- end_point_error / EndPointErrorLoss live in ops.losses (masked_epe,
  psm_deep_supervision_loss).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_right_to_left(right: jnp.ndarray, disparity: jnp.ndarray) -> jnp.ndarray:
    """Sample right(y, x - d(y,x)) -> left view. right (H, W, C), disparity
    (H, W); out-of-bounds samples are zero (grid_sample zero padding)."""
    h, w, c = right.shape
    xs = jnp.arange(w, dtype=disparity.dtype)[None, :] - disparity  # (H, W)
    inside = (xs >= 0) & (xs <= w - 1)
    x = jnp.clip(xs, 0.0, w - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    fx = (x - x0)[..., None]
    rows = right  # (H, W, C)
    v0 = jnp.take_along_axis(rows, x0[..., None].repeat(c, -1), axis=1)
    v1 = jnp.take_along_axis(rows, (x0 + 1)[..., None].repeat(c, -1), axis=1)
    out = v0 * (1 - fx) + v1 * fx
    return jnp.where(inside[..., None], out, 0.0)


def photometric_warp_error(
    left: jnp.ndarray, right: jnp.ndarray, disparity: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """L1 photometric error of the disparity-warped right image vs left."""
    warped = warp_right_to_left(right, disparity)
    err = jnp.abs(warped - left).mean(-1)
    if mask is not None:
        m = mask.astype(err.dtype)
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
    return err.mean()
