"""Elementwise losses: sigmoid focal loss, smooth-L1, disparity EPE.

Pure jnp — XLA fuses these; no kernels needed (the reference's CUDA
SigmoidFocalLoss, csrc/cuda/SigmoidFocalLoss_cuda.cu:1-188, is bandwidth-bound
elementwise work).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # (N, C) class logits, classes 1..C (no background col)
    targets: jnp.ndarray,  # (N,) int labels in [0..C], 0 = background
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-(anchor, class) focal loss, reference semantics.

    Matches csrc/cuda/SigmoidFocalLoss_cuda.cu forward: column c (1-indexed)
    is positive iff targets == c; background rows contribute to every column's
    negative term. Returns the (N, C) loss map (caller reduces).
    """
    n, c = logits.shape
    class_ids = jnp.arange(1, c + 1)
    t = (targets[:, None] == class_ids[None, :]).astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    term_pos = -t * alpha * ((1.0 - p) ** gamma) * jnp.log(jnp.clip(p, 1e-12))
    term_neg = (
        -(1.0 - t)
        * (1.0 - alpha)
        * (p**gamma)
        * jnp.log(jnp.clip(1.0 - p, 1e-12))
    )
    # targets == -1 marks ignored anchors (matcher BETWEEN code)
    keep = (targets >= 0)[:, None]
    return jnp.where(keep, term_pos + term_neg, 0.0)


def sigmoid_focal_loss_binary(
    logits: jnp.ndarray,
    targets: jnp.ndarray,  # same shape, {0, 1} float
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Binary focal loss used by the 3D RPN point-cls head
    (reference .../lib/utils/loss_utils.py SigmoidFocalClassificationLoss)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (reference layers/smooth_l1_loss.py)."""
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0, weight=None
) -> jnp.ndarray:
    out = smooth_l1(pred - target, beta)
    if weight is not None:
        out = out * weight
    return out


def masked_epe(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """End-point-error |pred - target| averaged over mask
    (reference utils/stereo_utils.py end_point_error)."""
    m = mask.astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - target) * m) / jnp.maximum(jnp.sum(m), 1.0)


def psm_deep_supervision_loss(
    preds: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    target: jnp.ndarray,
    mask: jnp.ndarray,
    weights: tuple[float, float, float] = (0.5, 0.7, 1.0),
) -> jnp.ndarray:
    """Deep-supervised masked smooth-L1 over the three PSMNet outputs
    (reference utils/loss_utils.py PSMLoss / dispmodule.py:232-271)."""
    m = mask.astype(target.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    total = 0.0
    for w, p in zip(weights, preds):
        total = total + w * jnp.sum(smooth_l1(p - target) * m) / denom
    return total


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Dice loss on sigmoid scores (reference loss_utils.DiceLoss)."""
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1).astype(p.dtype)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + eps) / (jnp.sum(p) + jnp.sum(t) + eps)
