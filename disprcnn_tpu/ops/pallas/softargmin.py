"""Fused trilinear-upsample + softmax + soft-argmin for PSMNet eval.

The reference regression head (stackhourglass.py:146-166 + submodule.py
disparityregression) trilinearly upsamples the (B, h/4, w/4, D/4) cost volume
to (B, H, W, D), softmaxes over disparity and takes the expectation. Done
naively that materializes the (B, H, W, D) volume several times (~1 GB at
B=16, 224^2, D=96) — pure HBM traffic, and the memory wall that blocks
batching the ROI dimension.

Split: the D- and H-upsamples run in XLA at low W (two small matrix
contractions, output (B, H, w/4, D)); the expensive last mile — W-upsample to
(H, W, D), softmax over D, expectation — is one Pallas kernel that keeps each
row stripe in VMEM and writes only the (B, H, W) disparity map to HBM. Math
is identical to the XLA path (linear maps compose; upsample order is
associative; softmax/expectation per output pixel).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS = 32  # output rows per grid step: at (B=16, 224^2, D=96) the per-
# step overhead dominated the old 8-row stripes (448 steps x ~3 us for
# ~0.5 us of dots each); 32 rows cuts the grid to 112 steps and still
# keeps the (ROWS, w4, D) block + (ROWS, W) output well inside VMEM


def interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) align_corners=True linear interpolation matrix."""
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1, 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    frac = (pos - i0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    m[rows, i0] += 1.0 - frac
    m[rows, i0 + 1] += frac
    return jnp.asarray(m)


def _kernel(mindisp, d, y_ref, mw_ref, out_ref):
    # y (1, ROWS, w4, D) f32; mw (W, w4); out (1, ROWS, W)
    mw = mw_ref[...]
    disp = (
        jax.lax.broadcasted_iota(jnp.int32, (1, d), 1).astype(jnp.float32)
        + jnp.float32(mindisp)
    )  # (1, D)
    for j in range(ROWS):  # unrolled: each step is a clean 2-D MXU dot
        z = jnp.dot(mw, y_ref[0, j], preferred_element_type=jnp.float32)  # (W, D)
        m = jnp.max(z, axis=1, keepdims=True)
        p = jnp.exp(z - m)
        out_ref[0, j] = jnp.sum(p * disp, axis=1) / jnp.sum(p, axis=1)


@partial(
    jax.jit,
    static_argnames=("out_hw", "mindisp", "maxdisp", "interpret"),
)
def fused_softargmin(
    c: jnp.ndarray,  # (B, h4, w4, D4) cost-volume logits, channels-last disp
    out_hw,
    mindisp: int,
    maxdisp: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, H, W) f32 expected disparity (reference eval regression)."""
    b, h4, w4, d4 = c.shape
    h, w = out_hw
    d = maxdisp - mindisp
    md = interp_matrix(d4, d)
    mh = interp_matrix(h4, h)
    mw = interp_matrix(w4, w)
    # D- and H-upsample at low W in XLA (cheap contractions)
    y = jnp.einsum("bhwd,ed->bhwe", c.astype(jnp.float32), md)
    y = jnp.einsum("bhwd,eh->bewd", y, mh)  # (B, H, w4, D)
    # grid rows come in ROWS-sized stripes: zero-pad H up and slice the
    # extra rows back off (softargmin of a zero row is finite and discarded)
    hp = -(-h // ROWS) * ROWS
    if hp != h:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    out = pl.pallas_call(
        partial(_kernel, mindisp, d),
        grid=(b, hp // ROWS),
        in_specs=[
            pl.BlockSpec((1, ROWS, w4, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((w, w4), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ROWS, w), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w), jnp.float32),
        interpret=interpret,
    )(y, mw)
    return out[:, :h] if hp != h else out
