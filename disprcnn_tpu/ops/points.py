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
import numpy as np


def _sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances (N,3) x (M,3) -> (N,M).

    Direct differences rather than the aa+bb-2ab matmul form: the latter loses
    ~1e-2 relative accuracy to cancellation in f32, enough to flip neighbour
    selection at radius boundaries. Summed as three broadcasted (N,M) squares
    so every intermediate tiles on (sublane, lane) — an (N,M,3) tensor puts 3
    elements in 128 lanes and turns the op into HBM padding traffic (measured
    6.9 ms of the PointRCNN stage before this layout).
    """
    acc = None
    for c in range(a.shape[-1]):
        d = a[:, c, None] - b[None, :, c]
        acc = d * d if acc is None else acc + d * d
    return acc


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
    """(B, N, 3) -> (B, npoint) int32 indices.

    On TPU this routes to the VMEM-resident Pallas kernel (bit-identical
    selection, see tests/test_pallas_kernels.py): the XLA fori_loop pays an
    HBM round-trip per iteration — measured 8.7 ms of the PointRCNN stage
    for the (256 clouds, 512->128) + (16, 768->512) ladder."""
    if jax.default_backend() == "tpu":
        from .pallas.fps import furthest_point_sample_pallas

        # index output: no gradient flows through selection; stop_gradient
        # keeps autodiff from tracing the pallas_call (no JVP rule) when the
        # point cloud carries tangents (train: points differentiable through
        # the disparity lift)
        return furthest_point_sample_pallas(jax.lax.stop_gradient(xyz), npoint)
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


def _rank_inclusive(mask: jnp.ndarray, force_mxu: Optional[bool] = None) -> jnp.ndarray:
    """Inclusive prefix count of a bool mask along the last axis, int32.

    TPU: upper-triangular ones MATMUL with f32 accumulation (exact for
    n << 2^24) — jnp.cumsum lowers to reduce_window_sum, measured 0.7 ms
    for a (3072, 768) mask where the MXU form is ~0.02 ms. CPU: cumsum.
    `force_mxu` overrides the backend dispatch (tests).
    """
    use_mxu = (jax.default_backend() == "tpu") if force_mxu is None else force_mxu
    if not use_mxu:
        return jnp.cumsum(mask, axis=-1, dtype=jnp.int32)
    n = mask.shape[-1]
    tri = (jnp.arange(n)[:, None] <= jnp.arange(n)[None, :]).astype(jnp.bfloat16)
    return jnp.dot(
        mask.astype(jnp.bfloat16), tri, preferred_element_type=jnp.float32
    ).astype(jnp.int32)


def first_k_true(mask: jnp.ndarray, k: int):
    """Indices of the first k True entries per row, in scan order.

    mask (R, N) bool -> (idx (R, k) int32, cnt (R,) int32). Slots >= cnt hold
    unspecified valid indices (callers overwrite them); rows with cnt == 0
    hold zeros.

    Two exact sort-free forms with the same (R, k, N) virtual size; which
    wins depends on scale (the VPU compare+count loop is compute-bound at
    ~13 ps/element regardless of dtype — verified; the one-hot MXU
    contraction is ~3x faster but its operand stops fusing at large sizes:
    measured +6 ms on the RCNN stage at 1.07G elements).
    """
    r, n = mask.shape
    rank = _rank_inclusive(mask)  # (R, N)
    cnt = jnp.minimum(rank[:, -1], k)
    if r * k * n <= 400_000_000 and jax.default_backend() == "tpu":
        # the (j+1)-th True entry is the unique MASKED position with
        # rank == j+1: one-hot contraction over N (indices exact in f32)
        ks1 = jnp.arange(1, k + 1, dtype=jnp.int32)
        oh = (rank[:, None, :] == ks1[None, :, None]) & mask[:, None, :]
        idx = jnp.einsum(
            "rkn,n->rk", oh.astype(jnp.float32),
            jnp.arange(n, dtype=jnp.float32),
        ).astype(jnp.int32)  # 0 where no such entry
    else:
        # count of positions with rank <= j, in int32: the compare+count loop
        # is compute-bound at the same rate regardless of dtype, and bf16 is
        # only exact for integers <= 256 — it silently corrupted 128/512 slots
        # at roipool3d's k=512 (sampled_pts_num) before this.
        ks = jnp.arange(k, dtype=jnp.int32)
        idx = jnp.sum(
            (rank[:, None, :] <= ks[None, :, None]).astype(jnp.int32), axis=-1
        )
        idx = jnp.minimum(idx, n - 1)
    return idx, cnt


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
    b, m = new_xyz.shape[:2]
    n = xyz.shape[1]
    d2 = jax.vmap(_sqdist)(new_xyz, xyz)  # (B, M, N)
    mask = (d2 < radius * radius).reshape(b * m, n)
    cand, cnt = first_k_true(mask, nsample)
    first = cand[:, :1]
    slot_valid = jnp.arange(nsample)[None, :] < cnt[:, None]
    out = jnp.where(slot_valid, cand, first)
    out = jnp.where(cnt[:, None] > 0, out, 0).astype(jnp.int32)
    return out.reshape(b, m, nsample)


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
        d2 = _sqdist(u, k)  # (N, M)
        # 3 iterations of (min, argmin, mask) instead of top_k: top_k lowers
        # to a full sort on TPU; ties resolve to the lowest index either way.
        dists, idxs = [], []
        cols = jnp.arange(d2.shape[1])[None, :]
        for _ in range(3):
            i = jnp.argmin(d2, axis=-1)
            d = jnp.min(d2, axis=-1)
            dists.append(d)
            idxs.append(i.astype(jnp.int32))
            d2 = jnp.where(cols == i[:, None], jnp.inf, d2)
        return (
            jnp.sqrt(jnp.maximum(jnp.stack(dists, -1), 0.0)),
            jnp.stack(idxs, -1),
        )

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
