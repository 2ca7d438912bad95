"""IoU matcher + balanced positive/negative sampler, fixed-shape.

Reference semantics (modeling/matcher.py:5-110,
modeling/balanced_positive_negative_sampler.py:5-68) with padded GT:
- match codes: >= 0 matched gt index; -1 below low threshold; -2 between.
- low-quality recovery: anchors achieving a gt's best IoU keep their own
  argmax assignment.
- sampling: up to batch*frac positives and (batch - num_pos) negatives chosen
  uniformly at random, expressed as PRNG-keyed top-k over randomized
  priorities (fixed-shape mask output).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BELOW_LOW = -1
BETWEEN = -2


def match(
    quality: jnp.ndarray,  # (M_gt, N_pred) IoU
    gt_valid: jnp.ndarray,  # (M_gt,) bool
    high: float,
    low: float,
    allow_low_quality: bool = True,
) -> jnp.ndarray:
    """-> (N_pred,) int32 match codes."""
    q = jnp.where(gt_valid[:, None], quality, -1.0)
    matched_vals = jnp.max(q, axis=0)
    argmax_gt = jnp.argmax(q, axis=0).astype(jnp.int32)
    matches = jnp.where(
        matched_vals >= high,
        argmax_gt,
        jnp.where(matched_vals < low, BELOW_LOW, BETWEEN),
    )
    if allow_low_quality:
        gt_best = jnp.max(q, axis=1, keepdims=True)  # (M, 1)
        # anchors that realize some valid gt's best IoU keep their argmax match
        is_best = jnp.any((q == gt_best) & gt_valid[:, None] & (gt_best > 0), axis=0)
        matches = jnp.where(is_best, argmax_gt, matches)
    return matches


def balanced_sample(
    key: jax.Array,
    labels: jnp.ndarray,  # (N,) float/int: >0 pos, 0 neg, -1 ignore
    batch_size: int,
    positive_fraction: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (pos_mask, neg_mask) bool (N,), sampled counts per reference rules."""
    n = labels.shape[0]
    kp, kn = jax.random.split(key)
    is_pos = labels >= 1
    is_neg = labels == 0
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(is_pos), max_pos)
    num_neg = jnp.minimum(jnp.sum(is_neg), batch_size - num_pos)

    def pick(k, mask, count, cap):
        cap = min(cap, n)  # tiny inputs: fewer candidates than the budget
        pri = jnp.where(mask, jax.random.uniform(k, (n,)), -1.0)
        _, idx = jax.lax.top_k(pri, cap)
        sel = jnp.zeros(n, bool).at[idx].set(jnp.arange(cap) < count)
        return sel & mask

    pos = pick(kp, is_pos, num_pos, max_pos)
    neg = pick(kn, is_neg, num_neg, batch_size)
    return pos, neg
