"""Exact large-k top-k via threshold bisection + searchsorted compaction.

`jax.lax.top_k` lowers to a FULL variadic sort on TPU (verified for this
jax in ops/points.three_nn's investigation). The SRPN proposal selection
needs the top pre_nms_top_n=6000 of ~119k anchor scores — sorting 119k
rows to keep 5% of them. This computes the same result as lax.top_k
(same set, same descending order, same lowest-index tie resolution) with:

1. 31 bisection passes on the float bit pattern to find the k-th value
   (scores are softmax probs >= 0, whose IEEE-754 bits order monotonically);
2. an exclusive-prefix-count compaction, inverted with searchsorted over
   the (monotone) cumulative count — 17 rounds of (B, k) gathers, no
   full-width sort and no (B, k, N) one-hot;
3. a final stable sort of only the k compacted elements.

Ties at the threshold value are kept lowest-index-first, matching XLA's
stable TopK. Scores must be non-negative and finite (softmax output).

Env kill switch: DISPRCNN_TOPK_SELECT=0 falls back to lax.top_k (the two
are interchangeable; keep whichever measures faster on-chip).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp


def _use_threshold_topk() -> bool:
    return os.environ.get("DISPRCNN_TOPK_SELECT", "1") != "0"


@partial(jax.jit, static_argnames=("k",))
def topk_threshold(scores: jnp.ndarray, k: int):
    """(B, N) f32 non-negative -> (values (B, k) desc, indices (B, k) i32).

    Bit-identical to jax.lax.top_k for non-negative finite scores.
    """
    b, n = scores.shape
    assert k <= n

    # --- 1. bisect the k-th largest value on the int32 bit pattern
    # (non-negative floats compare identically as int32)
    bits = jax.lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.int32)

    def body(state, _):
        lo, hi = state  # invariant: count(>= hi) < k <= count(>= lo)
        mid = (lo + hi + 1) // 2  # round up so lo < mid <= hi
        cnt = jnp.sum((bits >= mid[:, None]).astype(jnp.int32), axis=1)
        take = cnt >= k
        return (jnp.where(take, mid, lo), jnp.where(take, hi, mid - 1)), None

    lo0 = jnp.zeros((b,), jnp.int32)
    hi0 = jnp.full((b,), jnp.int32(0x7F800000))  # +inf bits
    # 31 iterations pin the exact bit pattern of the k-th value
    (lo, _), _ = jax.lax.scan(body, (lo0, hi0), None, length=31)
    thresh = lo  # bits of the k-th largest value

    # --- 2. keep set: all above-threshold elements (c1 < k of them) plus
    # the first k - c1 threshold-equal elements in index order — matching
    # stable-TopK tie handling
    above = bits > thresh[:, None]
    equal = bits == thresh[:, None]
    c1 = jnp.sum(above.astype(jnp.int32), axis=1, keepdims=True)  # (B, 1)
    tie_rank = jnp.cumsum(equal.astype(jnp.int32), axis=1) - equal  # excl
    keep = above | (equal & (tie_rank < (k - c1)))

    # compaction: cumulative keep-count is monotone and steps by exactly 1
    # at each kept n, so the j-th kept index is searchsorted(c, j+1) —
    # log2(N) rounds of (k,) gathers, nothing full-width
    c = jnp.cumsum(keep.astype(jnp.int32), axis=1)  # (B, N)
    q = jnp.arange(1, k + 1, dtype=jnp.int32)
    idx = jax.vmap(
        lambda cc: jnp.searchsorted(cc, q, side="left")
    )(c).astype(jnp.int32)
    vals = jnp.take_along_axis(scores, idx, axis=1)

    # --- 3. order the k kept elements by score desc; stable keeps
    # equal-score elements in their current (index) order, as lax.top_k
    order = jnp.argsort(-vals, axis=1, stable=True)
    return (
        jnp.take_along_axis(vals, order, axis=1),
        jnp.take_along_axis(idx, order, axis=1),
    )


def topk_scores(scores: jnp.ndarray, k: int):
    """Dispatch: threshold-select (default) or lax.top_k (env kill switch).

    Only valid for non-negative scores (SRPN uses softmax probs)."""
    if not _use_threshold_topk():
        return jax.lax.top_k(scores, k)
    return topk_threshold(scores, k)
