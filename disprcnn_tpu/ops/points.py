"""PointNet++ primitive ops: FPS, ball query, grouping, three-NN interpolation.

Fixed-shape XLA formulations of the reference's pointnet2 CUDA extension
(.../pointnet2/src/{sampling,ball_query,group_points,interpolate}*.cu), with
bit-identical selection semantics:
- FPS starts at index 0 and iteratively takes the argmax of the running
  min-distance to the selected set (ties -> lowest index).
- Ball query scans points in index order, keeps the first `nsample` within
  `radius` (strict <), pre-fills unused slots with the first neighbour, and
  returns all-zeros when the ball is empty.
- three-NN takes the 3 smallest distances with inverse-distance weights.

Convention: points are channel-last (B, N, 3) / features (B, N, C) — the
TPU-friendly layout (channel dim maps to lanes); the reference uses (B, C, N).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances (N,3) x (M,3) -> (N,M).

    Direct differences rather than the aa+bb-2ab matmul form: the latter loses
    ~1e-2 relative accuracy to cancellation in f32, enough to flip neighbour
    selection at radius boundaries. Point counts here are O(1e3) so the (N,M,3)
    intermediate is cheap.
    """
    d = a[:, None, :] - b[None, :, :]
    return jnp.sum(d * d, axis=-1)


def _fps_single(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Furthest point sampling indices for one cloud (N,3) -> (npoint,)."""
    n = xyz.shape[0]

    def body(i, state):
        mindist, idx, last = state
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        mindist = jnp.minimum(mindist, d)
        nxt = jnp.argmax(mindist)
        idx = idx.at[i].set(nxt)
        return mindist, idx, nxt

    mindist0 = jnp.full((n,), 1e10, dtype=xyz.dtype)
    idx0 = jnp.zeros((npoint,), dtype=jnp.int32)
    # slot 0 is always point 0 (reference sampling_gpu.cu seeds with idx 0)
    _, idx, _ = jax.lax.fori_loop(1, npoint, body, (mindist0, idx0, jnp.int32(0)))
    return idx


@partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32 indices."""
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


def fps_or_identity(xyz: jnp.ndarray, npoint: int) -> Optional[jnp.ndarray]:
    """None when npoint >= N: FPS of all points is a permutation, and every
    consumer here (centers for ball query / max-pooled neighbourhoods) is
    order-invariant — skipping saves npoint sequential loop steps."""
    if npoint >= xyz.shape[1]:
        return None
    return furthest_point_sample(xyz, npoint)


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C), (B, M) -> (B, M, C).

    Row-wise gather via vmapped integer indexing: take_along_axis would
    broadcast indices over C and lower to per-ELEMENT gathers (slice size 1),
    ~20x slower on TPU than whole-row slices.
    """
    return jax.vmap(lambda f, i: f[i])(feats, idx)


@partial(jax.jit, static_argnames=("nsample", "radius"))
def ball_query(
    new_xyz: jnp.ndarray,  # (B, M, 3) query centers
    xyz: jnp.ndarray,  # (B, N, 3) source points
    radius: float,
    nsample: int,
) -> jnp.ndarray:
    """First-found neighbours within radius -> (B, M, nsample) int32.

    Reference semantics (ball_query_gpu.cu:1-66): scan order = point index,
    strict `< radius^2`, empty ball -> zeros, partial ball -> first neighbour
    repeated in the tail slots.
    """
    n = xyz.shape[1]

    def per_batch(centers, pts):
        d2 = _sqdist(centers, pts)  # (M, N)
        mask = d2 < radius * radius
        order_key = jnp.where(mask, jnp.arange(n)[None, :], n)
        # first nsample in-radius indices in scan order: top_k of the negated
        # key (k << N, far cheaper than a full sort)
        neg, _ = jax.lax.top_k(-order_key, nsample)
        cand = -neg
        cnt = jnp.minimum(jnp.sum(mask, axis=-1), nsample)  # (M,)
        first = cand[:, :1]
        slot_valid = jnp.arange(nsample)[None, :] < cnt[:, None]
        out = jnp.where(slot_valid, cand, first)
        return jnp.where(cnt[:, None] > 0, out, 0).astype(jnp.int32)

    return jax.vmap(per_batch)(new_xyz, xyz)


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C), (B, M, S) -> (B, M, S, C).

    TPU path: one-hot MATMUL instead of row gathers. XLA's row gather
    (slice size (1, C)) runs at ~1 row/cycle — 18 ms for the RCNN stage's
    (256, 8192) x 128ch grouping — while the equivalent
    einsum('bmn,bnc->bmc', onehot(idx), feats) rides the MXU and the iota
    comparison fuses into the matmul operand (~2 ms). Exact for any dtype:
    the one-hot is built in the feature dtype and multiplies by 1.0.
    """
    b, m, s = idx.shape
    n = feats.shape[1]
    flat = idx.reshape(b, m * s)
    onehot = (flat[:, :, None] == jnp.arange(n)[None, None, :]).astype(feats.dtype)
    out = jnp.einsum("bmn,bnc->bmc", onehot, feats)
    return out.reshape(b, m, s, feats.shape[-1])


def group_points_gather(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row-gather fallback (faster on CPU; used by the numpy-oracle tests)."""
    b, m, s = idx.shape
    flat = idx.reshape(b, m * s)
    out = jax.vmap(lambda f, i: f[i])(feats, flat)
    return out.reshape(b, m, s, feats.shape[-1])


@jax.jit
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest neighbours of each `unknown` point among `known`.

    (B, N, 3), (B, M, 3) -> dists (B, N, 3), idx (B, N, 3) int32.
    """

    def per_batch(u, k):
        d2 = _sqdist(u, k)
        neg, idx = jax.lax.top_k(-d2, 3)
        return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)

    return jax.vmap(per_batch)(unknown, known)


@jax.jit
def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray):
    """Weighted 3-NN feature interpolation.

    feats (B, M, C), idx (B, N, 3), weight (B, N, 3) -> (B, N, C).
    """
    gathered = group_points(feats, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def three_nn_interpolate_weights(dists: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights (reference pointnet2_modules FP module)."""
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
