"""Pallas greedy-NMS kernel (2D axis-aligned, legacy +1 convention).

Greedy NMS is sequential in the number of SURVIVORS (k), not candidates (N):
pick the best alive box, suppress its overlaps, repeat. The XLA formulations
pay either O(N) loop steps (fori select-and-suppress: ~0.1 ms/step of loop
overhead) or an O(N^2)-memory IoU matrix whose fixpoint iteration re-reads
~N^2 floats per pass with a DATA-DEPENDENT pass count (long suppression
chains -> 10+ ms at N=6000; measured in the SRPN postprocess).

Here the whole problem lives in VMEM (6000 boxes = 96 KB): k iterations of
[masked-min index pick -> one-hot coord extract -> vectorized IoU row ->
alive-mask update], each a handful of (8, N/8) VPU ops. Data-independent
cost, ~0.2 ms at N=6000, k=300.

Semantics match ops.nms.nms_topk exactly: score-descending greedy (caller
passes boxes ALREADY SORTED by score), suppression at IoU > thresh (strict,
nms.cu devIoU), +1 pixel convention via `to_remove`, lowest-index tie-break
(inherent: the pick is a masked min over the sorted index).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # sublane tile


def _nms_kernel(k: int, n_pad: int, thresh: float, to_remove: float,
                boxes_ref, alive_in_ref, out_ref, alive):
    # boxes (4, n_pad) f32 rows: x1, y1, x2, y2 (score-sorted, padded with
    # huge far-away boxes); alive_in (SUB, n_pad/SUB) bool-as-i32;
    # out (SUB, k/SUB...) -> flat (1, k) int32 indices
    cols = n_pad // SUB
    # boxes come pre-tiled as (4*SUB, cols): coordinate-major sublane blocks
    # (in-kernel reshapes that retile lanes<->sublanes are not Mosaic-cheap)
    x1 = boxes_ref[0 * SUB : 1 * SUB, :]
    y1 = boxes_ref[1 * SUB : 2 * SUB, :]
    x2 = boxes_ref[2 * SUB : 3 * SUB, :]
    y2 = boxes_ref[3 * SUB : 4 * SUB, :]
    area = jnp.maximum(x2 - x1 + to_remove, 0.0) * jnp.maximum(y2 - y1 + to_remove, 0.0)
    # flat sorted index of each slot (row-major over the (SUB, cols) view)
    idxmap = (jax.lax.broadcasted_iota(jnp.int32, (SUB, cols), 0) * cols
              + jax.lax.broadcasted_iota(jnp.int32, (SUB, cols), 1))
    alive[...] = alive_in_ref[...]
    out_ref[...] = jnp.full(out_ref.shape, n_pad, jnp.int32)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)

    def body(i, _):
        a = alive[...] != 0
        sel = jnp.min(jnp.where(a, idxmap, n_pad))  # scalar; n_pad if none
        onehot = (idxmap == sel) & a
        of = onehot.astype(jnp.float32)
        sx1 = jnp.sum(x1 * of)
        sy1 = jnp.sum(y1 * of)
        sx2 = jnp.sum(x2 * of)
        sy2 = jnp.sum(y2 * of)
        sarea = jnp.sum(area * of)
        w = jnp.maximum(jnp.minimum(x2, sx2) - jnp.maximum(x1, sx1) + to_remove, 0.0)
        h = jnp.maximum(jnp.minimum(y2, sy2) - jnp.maximum(y1, sy1) + to_remove, 0.0)
        inter = w * h
        iou = inter / jnp.maximum(sarea + area - inter, 1e-12)
        any_sel = jnp.sum(of) > 0.0  # no survivor left: emit nothing
        kill = onehot | ((iou > thresh) & any_sel)
        alive[...] = jnp.where(kill, 0, alive[...])
        emit = jnp.where(any_sel, sel, n_pad)
        out_ref[...] = jnp.where(out_lanes == i, emit, out_ref[...])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@partial(jax.jit, static_argnames=("k", "thresh", "to_remove", "interpret"))
def nms_sorted_pallas(
    boxes_sorted: jnp.ndarray,  # (N, 4) xyxy, score-descending
    valid_sorted: jnp.ndarray,  # (N,) bool
    k: int,
    thresh: float,
    to_remove: float = 1.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (sorted-order indices (k,), out_valid (k,)): the first k survivors
    of exact greedy NMS over the score-sorted boxes."""
    n = boxes_sorted.shape[0]
    n_pad = -(-n // (SUB * 128)) * (SUB * 128)
    bt = jnp.transpose(boxes_sorted.astype(jnp.float32))  # (4, N)
    if n_pad != n:
        bt = jnp.pad(bt, ((0, 0), (0, n_pad - n)))
    bt = bt.reshape(4 * SUB, n_pad // SUB)  # coordinate-major sublane blocks
    av = jnp.pad(valid_sorted.astype(jnp.int32), (0, n_pad - n)).reshape(
        SUB, n_pad // SUB
    )
    k_pad = -(-k // 128) * 128
    kernel = partial(_nms_kernel, k_pad, n_pad, thresh, to_remove)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, k_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((SUB, n_pad // SUB), jnp.int32)],
        interpret=interpret,
    )(bt, av)
    idx = out[0, :k]
    ok = idx < n_pad
    return jnp.minimum(idx, n - 1), ok
