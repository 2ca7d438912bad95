"""Multi-level FPN ROI pooling, fixed-shape.

Reference Pooler + LevelMapper (modeling/poolers.py:11-149). NOTE this fork's
level heuristic is round(4 + ln(sqrt(area)/224)) — NATURAL log and round(),
not the FPN paper's floor/log2 (poolers.py:39-41) — clamped to [2, 5].

TPU formulation: pooling is performed on EVERY level for every ROI and the
per-ROI level assignment selects the result. That is 4x the gather work of the
reference's scatter-by-level, but it is branch-free, fixed-shape, and the
gathers are cheap relative to the heads; a Pallas pooler with scalar-prefetch
level indices is the later optimization if profiling demands.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ...ops.roi_align import roi_align_batched


def assign_levels(
    boxes: jnp.ndarray, k_min: int = 2, k_max: int = 5, canonical: float = 224.0
) -> jnp.ndarray:
    """(N, 4) xyxy -> (N,) int32 level offsets in [0, k_max - k_min]."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0] + 1, 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1] + 1, 0
    )
    s = jnp.sqrt(area)
    lvl = jnp.round(4.0 + jnp.log(jnp.maximum(s, 1e-6) / canonical))
    return (jnp.clip(lvl, k_min, k_max) - k_min).astype(jnp.int32)


def fpn_roi_align(
    features: Sequence[jnp.ndarray],  # per level (B, H_l, W_l, C)
    boxes: jnp.ndarray,  # (N, 4) image coords
    batch_idx: jnp.ndarray,  # (N,)
    scales: Sequence[float],  # per level, e.g. (1/4, 1/8, 1/16, 1/32)
    resolution: int,
    sampling_ratio: int,
    regular: bool = True,  # every in-repo caller passes ROIs row-major with
    # batch_idx == repeat(arange(B), K); that regularity lets roi_align use
    # its batch-LINEAR per-image contraction (the flat form's dot flops grow
    # as B^2 — the round-3 batch-superlinear term). Pass False for irregular
    # batch_idx layouts.
) -> jnp.ndarray:
    """-> (N, resolution, resolution, C)."""
    b = features[0].shape[0]
    n = boxes.shape[0]
    rpi = n // b if (regular and n % b == 0) else None
    levels = assign_levels(boxes)
    pooled = jnp.stack(
        [
            roi_align_batched(
                f, boxes, batch_idx, resolution, spatial_scale=s,
                sampling_ratio=sampling_ratio, rois_per_image=rpi,
            )
            for f, s in zip(features, scales)
        ],
        axis=0,
    )  # (L, N, r, r, C)
    onehot = (jnp.arange(len(scales))[:, None] == levels[None, :]).astype(pooled.dtype)
    return jnp.einsum("ln,lnabc->nabc", onehot, pooled)
