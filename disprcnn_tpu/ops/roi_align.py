"""ROIAlign / ROIPool as pure-XLA gather programs (autodiff backward for free).

Matches the reference's legacy (non-half-pixel-aligned) CUDA semantics
(csrc/cuda/ROIAlign_cuda.cu:15-120):
- roi coords scaled by spatial_scale with NO -0.5 offset,
- malformed ROIs forced to 1x1,
- per-bin sampling grid of `sampling_ratio`^2 points at (i + .5)/S spacing,
- bilinear interpolation with the kernel's boundary rules: points outside
  [-1, size] contribute 0; otherwise coords clamp into [0, size-1].

TPU deviation: the reference's `sampling_ratio == 0` means an adaptive,
data-dependent grid (`ceil(roi_size / pooled_size)`), which is not expressible
with static shapes; we use a static grid of 2 in that case (the value the
shipped configs use where they set it explicitly, e.g.
configs/kitti/car/vob/mask.yaml:29).

Bilinear sampling is separable (rows then columns), so each ROI costs two
gathers instead of a 2-D gather per sample point — the XLA-friendly layout.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_axis(coords: jnp.ndarray, size: int):
    """1-D bilinear indices/weights with legacy ROIAlign boundary rules."""
    inside = (coords >= -1.0) & (coords <= size)
    c = jnp.clip(coords, 0.0, size - 1)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, max(size - 2, 0))
    frac = c - i0.astype(c.dtype)
    w0 = jnp.where(inside, 1.0 - frac, 0.0)
    w1 = jnp.where(inside, frac, 0.0)
    return i0, jnp.minimum(i0 + 1, size - 1), w0, w1


def _sample_grid_1d(start: jnp.ndarray, bin_size: jnp.ndarray, pooled: int, s: int):
    """Sampling coordinates for all pooled*s points along one axis."""
    ph = jnp.arange(pooled * s) // s
    i = jnp.arange(pooled * s) % s
    return start + ph * bin_size + (i + 0.5) * bin_size / s


def _roi_align_single(
    feat: jnp.ndarray,  # (H, W, C)
    box: jnp.ndarray,  # (4,) xyxy in image coords
    pooled: int,
    spatial_scale: float,
    s: int,
) -> jnp.ndarray:
    h, w = feat.shape[0], feat.shape[1]
    x1, y1, x2, y2 = box[0] * spatial_scale, box[1] * spatial_scale, box[2] * spatial_scale, box[3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled

    ys = _sample_grid_1d(y1, bin_h, pooled, s)  # (pooled*s,)
    xs = _sample_grid_1d(x1, bin_w, pooled, s)

    y0, y1i, wy0, wy1 = _interp_axis(ys, h)
    x0, x1i, wx0, wx1 = _interp_axis(xs, w)

    # rows: (pooled*s, W, C)
    rows = feat[y0] * wy0[:, None, None] + feat[y1i] * wy1[:, None, None]
    # cols: (pooled*s, pooled*s, C)
    vals = (
        rows[:, x0] * wx0[None, :, None] + rows[:, x1i] * wx1[None, :, None]
    )
    # average the s x s samples inside each bin
    vals = vals.reshape(pooled, s, pooled, s, -1)
    return vals.mean(axis=(1, 3))


@partial(jax.jit, static_argnames=("pooled", "spatial_scale", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,  # (H, W, C)
    boxes: jnp.ndarray,  # (N, 4) xyxy image coords
    pooled: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign of N boxes on one feature map -> (N, pooled, pooled, C)."""
    s = sampling_ratio if sampling_ratio > 0 else 2
    return jax.vmap(lambda b: _roi_align_single(features, b, pooled, spatial_scale, s))(
        boxes
    )


def _interp_matrices(box, h, w, pooled, s, spatial_scale):
    """Per-ROI separable bilinear+bin-average matrices, image-local:
    -> my (pooled, H), mx (pooled, W)."""
    x1, y1 = box[0] * spatial_scale, box[1] * spatial_scale
    x2, y2 = box[2] * spatial_scale, box[3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    ys = _sample_grid_1d(y1, roi_h / pooled, pooled, s)
    xs = _sample_grid_1d(x1, roi_w / pooled, pooled, s)
    y0, y1i, wy0, wy1 = _interp_axis(ys, h)
    x0, x1i, wx0, wx1 = _interp_axis(xs, w)
    iota_h = jnp.arange(h)
    my = (iota_h[None, :] == y0[:, None]) * wy0[:, None] + (
        iota_h[None, :] == y1i[:, None]
    ) * wy1[:, None]
    my = my.reshape(pooled, s, h).mean(axis=1)
    iota_w = jnp.arange(w)
    mx = (iota_w[None, :] == x0[:, None]) * wx0[:, None] + (
        iota_w[None, :] == x1i[:, None]
    ) * wx1[:, None]
    mx = mx.reshape(pooled, s, w).mean(axis=1)
    return my, mx


@partial(jax.jit, static_argnames=("pooled", "spatial_scale",
                                   "sampling_ratio", "rois_per_image"))
def roi_align_batched(
    features: jnp.ndarray,  # (B, H, W, C)
    boxes: jnp.ndarray,  # (N, 4)
    batch_idx: jnp.ndarray,  # (N,) int32
    pooled: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    rois_per_image: int | None = None,
) -> jnp.ndarray:
    """ROIAlign with per-ROI batch indices -> (N, pooled, pooled, C).

    MXU formulation: bilinear sampling + bin averaging is linear along each
    axis, so each ROI is two small matrix contractions
      t = My @ X      (pooled, B*H) x (B*H, W*C)
      o = t @ Mx^T    per output column
    instead of per-sample row gathers (XLA row gathers run ~1 row/cycle;
    the gather version cost 15.6 ms for 300 ROIs on a P2-sized map, this
    runs in ~1 ms). The per-ROI batch index folds into My as a bi*H column
    offset on the flattened (B*H) axis.

    rois_per_image: when the caller's boxes are REGULAR — exactly K ROIs per
    image, row-major, batch_idx == repeat(arange(B), K) (every model call
    site is) — pass K to take the per-image batched contraction instead.
    The flattened form's My columns span B*H, so its dot flops grow as
    B^2 (measured: the whole 2D stage's per-pair HLO flops rose 0.757 ->
    1.394 TFLOP from pairs=1 to 8, ~0.09 TFLOP*B^2 — the round-3 bench's
    batch-superlinear term). The per-image form is batch-linear AND its
    intermediate carries min(H, W) instead of the flat axis.
    """
    s = sampling_ratio if sampling_ratio > 0 else 2
    b, h, w, c = features.shape
    if rois_per_image is not None:
        assert boxes.shape[0] == b * rois_per_image, (boxes.shape, b,
                                                      rois_per_image)
        k = rois_per_image
        my, mx = jax.vmap(jax.vmap(
            lambda bx: _interp_matrices(bx, h, w, pooled, s, spatial_scale)
        ))(boxes.reshape(b, k, 4))
        my = my.astype(features.dtype)  # (B, K, P, H)
        mx = mx.astype(features.dtype)  # (B, K, P, W)
        # contract the LONGER spatial axis first: the intermediate carries
        # the other one
        if w >= h:
            t = jnp.einsum("bkqw,bhwc->bkqhc", mx, features)
            out = jnp.einsum("bkph,bkqhc->bkpqc", my, t)
        else:
            t = jnp.einsum("bkph,bhwc->bkpwc", my, features)
            out = jnp.einsum("bkqw,bkpwc->bkpqc", mx, t)
        return out.reshape(b * k, pooled, pooled, c)
    flat = features.reshape(b * h, w, c)

    def matrices(box, bi):
        x1, y1 = box[0] * spatial_scale, box[1] * spatial_scale
        x2, y2 = box[2] * spatial_scale, box[3] * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        ys = _sample_grid_1d(y1, roi_h / pooled, pooled, s)
        xs = _sample_grid_1d(x1, roi_w / pooled, pooled, s)
        y0, y1i, wy0, wy1 = _interp_axis(ys, h)
        x0, x1i, wx0, wx1 = _interp_axis(xs, w)
        iota_bh = jnp.arange(b * h)
        off = bi * h
        my = (iota_bh[None, :] == (y0 + off)[:, None]) * wy0[:, None] + (
            iota_bh[None, :] == (y1i + off)[:, None]
        ) * wy1[:, None]
        my = my.reshape(pooled, s, b * h).mean(axis=1)  # (pooled, B*H)
        iota_w = jnp.arange(w)
        mx = (iota_w[None, :] == x0[:, None]) * wx0[:, None] + (
            iota_w[None, :] == x1i[:, None]
        ) * wx1[:, None]
        mx = mx.reshape(pooled, s, w).mean(axis=1)  # (pooled, W)
        return my, mx

    my, mx = jax.vmap(matrices)(boxes, batch_idx)  # (N, P, B*H), (N, P, W)
    my = my.astype(features.dtype)
    mx = mx.astype(features.dtype)
    # contract the LONGER spatial axis first: the (R, P, uncontracted, C)
    # intermediate carries the other one — at the 2-view P2 geometry the
    # H-first order materialized (300, 7, 312, 256), ~0.7 ms more HBM
    # traffic per call than W-first with B*H = 192
    if w >= b * h:
        t = jnp.einsum("rqw,hwc->rqhc", mx, flat)
        return jnp.einsum("rph,rqhc->rpqc", my, t)
    t = jnp.einsum("rph,hwc->rpwc", my, flat)
    return jnp.einsum("rqw,rpwc->rpqc", mx, t)


def _roi_pool_single(feat, box, pooled, spatial_scale):
    """Legacy max ROIPool (csrc/cuda/ROIPool_cuda.cu): integer bin edges, max."""
    h, w = feat.shape[0], feat.shape[1]
    x1 = jnp.round(box[0] * spatial_scale)
    y1 = jnp.round(box[1] * spatial_scale)
    x2 = jnp.round(box[2] * spatial_scale)
    y2 = jnp.round(box[3] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1, 1.0)
    bin_h, bin_w = roi_h / pooled, roi_w / pooled

    hs = jnp.arange(h, dtype=jnp.float32)
    ws = jnp.arange(w, dtype=jnp.float32)
    # membership of each feature row/col in each pooled bin
    ph = jnp.arange(pooled, dtype=jnp.float32)
    hstart = jnp.clip(jnp.floor(ph * bin_h) + y1, 0, h)
    hend = jnp.clip(jnp.ceil((ph + 1) * bin_h) + y1, 0, h)
    wstart = jnp.clip(jnp.floor(ph * bin_w) + x1, 0, w)
    wend = jnp.clip(jnp.ceil((ph + 1) * bin_w) + x1, 0, w)
    row_in = (hs[None, :] >= hstart[:, None]) & (hs[None, :] < hend[:, None])  # (P, H)
    col_in = (ws[None, :] >= wstart[:, None]) & (ws[None, :] < wend[:, None])  # (P, W)
    neg = jnp.finfo(feat.dtype).min
    rows = jnp.max(
        jnp.where(row_in[:, :, None, None], feat[None], neg), axis=1
    )  # (P, W, C)
    out = jnp.max(jnp.where(col_in[None, :, :, None], rows[:, None], neg), axis=2)
    empty = (row_in.sum(1)[:, None] == 0) | (col_in.sum(1)[None, :] == 0)
    return jnp.where(empty[:, :, None], 0.0, out)


@partial(jax.jit, static_argnames=("pooled", "spatial_scale"))
def roi_pool(features, boxes, pooled, spatial_scale=1.0):
    """Max ROIPool of N boxes -> (N, pooled, pooled, C)."""
    return jax.vmap(lambda b: _roi_pool_single(features, b, pooled, spatial_scale))(boxes)


@partial(jax.jit, static_argnames=("pooled", "spatial_scale", "sampling_ratio"))
def roi_align_batched_gather(
    features: jnp.ndarray,  # (B, H, W, C)
    boxes: jnp.ndarray,  # (N, 4)
    batch_idx: jnp.ndarray,  # (N,) int32
    pooled: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """roi_align_batched via flat POINT gathers (identical output; tested).

    Each bilinear tap is one row gather from the flattened (B*H*W, C) map:
    4 gathers of (N, P*s, P*s) rows, no intermediate bigger than the output.
    MEASURED on TPU (300 ROIs, P2-sized map): 2.47 ms at 7x7 / 7.8 ms at
    14x14 vs 1.09 ms for the matrix contraction — XLA row gathers lose to
    the MXU even with a ~300 MB HBM intermediate, so roi_align_batched
    remains the default; this form is kept as the oracle-grade alternative
    (and for tiny channel counts where the matmul cannot tile).
    """
    s = sampling_ratio if sampling_ratio > 0 else 2
    b, h, w, c = features.shape
    flat = features.reshape(b * h * w, c)

    def grids(box):
        x1, y1 = box[0] * spatial_scale, box[1] * spatial_scale
        x2, y2 = box[2] * spatial_scale, box[3] * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        ys = _sample_grid_1d(y1, roi_h / pooled, pooled, s)
        xs = _sample_grid_1d(x1, roi_w / pooled, pooled, s)
        y0, y1i, wy0, wy1 = _interp_axis(ys, h)
        x0, x1i, wx0, wx1 = _interp_axis(xs, w)
        return y0, y1i, wy0, wy1, x0, x1i, wx0, wx1

    y0, y1i, wy0, wy1, x0, x1i, wx0, wx1 = jax.vmap(grids)(boxes)  # (N, P*s)
    base = (batch_idx * h)[:, None, None]

    def tap(yi, xi, wy, wx):
        idx = (base + yi[:, :, None]) * w + xi[:, None, :]  # (N, Ps, Ps)
        v = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, c)
        return v * (wy[:, :, None] * wx[:, None, :])[..., None].astype(v.dtype)

    vals = (
        tap(y0, x0, wy0, wx0) + tap(y0, x1i, wy0, wx1)
        + tap(y1i, x0, wy1, wx0) + tap(y1i, x1i, wy1, wx1)
    )
    n, ps = vals.shape[0], vals.shape[1]
    vals = vals.reshape(n, pooled, s, pooled, s, c)
    return vals.mean(axis=(2, 4))
