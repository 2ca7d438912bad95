"""2D box delta codecs, including the 6-parameter stereo variants.

Vectorized jnp equivalents of the reference BoxCoder
(modeling/box_coder.py:7-279). A stereo box is (x1, y1, x2, y2, x1', x2'):
the right view shares y1/y2 with the left. Deltas are
(dx, dy, dw, dh, dx', dw'); ``fromboxes4`` encodes the right pair against the
LEFT proposal geometry, ``fromboxes6`` against the right pair's own.
All use the legacy +1 width convention and log-space clipping at
log(1000/16).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def _geom(b):
    w = b[..., 2] - b[..., 0] + 1.0
    h = b[..., 3] - b[..., 1] + 1.0
    return w, h, b[..., 0] + 0.5 * w, b[..., 1] + 0.5 * h


def _geom_p(b):  # right-pair (x1', x2') columns 4:6
    w = b[..., 5] - b[..., 4] + 1.0
    return w, b[..., 4] + 0.5 * w


def encode4(ref: jnp.ndarray, prop: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)):
    """(N,4) reference boxes vs (N,4) proposals -> (N,4) deltas."""
    wx, wy, ww, wh = weights
    ew, eh, ecx, ecy = _geom(prop)
    gw, gh, gcx, gcy = _geom(ref)
    return jnp.stack(
        [
            wx * (gcx - ecx) / ew,
            wy * (gcy - ecy) / eh,
            ww * jnp.log(gw / ew),
            wh * jnp.log(gh / eh),
        ],
        axis=-1,
    )


def encode6(
    ref6: jnp.ndarray, prop: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """Stereo encode. prop is (N,4) (anchors; right encoded against left
    geometry) or (N,6) (stereo proposals)."""
    wx, wy, ww, wh = weights
    base = encode4(ref6[..., :4], prop[..., :4], weights)
    gwp, gcxp = _geom_p(ref6)
    if prop.shape[-1] == 6:
        ewp, ecxp = _geom_p(prop)
    else:
        ew, _, ecx, _ = _geom(prop)
        ewp, ecxp = ew, ecx
    return jnp.concatenate(
        [base, jnp.stack([wx * (gcxp - ecxp) / ewp, ww * jnp.log(gwp / ewp)], -1)],
        axis=-1,
    )


def decode4(deltas: jnp.ndarray, boxes: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)):
    """(N, 4*K) deltas vs (N,4) boxes -> (N, 4*K) xyxy."""
    wx, wy, ww, wh = weights
    w, h, cx, cy = _geom(boxes)
    shape = deltas.shape
    d = deltas.reshape(shape[:-1] + (-1, 4))
    dx, dy = d[..., 0] / wx, d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(d[..., 3] / wh, BBOX_XFORM_CLIP)
    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = jnp.exp(dw) * w[..., None]
    ph = jnp.exp(dh) * h[..., None]
    out = jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )
    return out.reshape(shape)


def decode6(deltas: jnp.ndarray, boxes: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)):
    """(N, 6*K) deltas vs (N,4|6) boxes -> (N, 6*K) stereo boxes."""
    wx, wy, ww, wh = weights
    w, h, cx, cy = _geom(boxes)
    if boxes.shape[-1] == 6:
        wp, cxp = _geom_p(boxes)
    else:
        wp, cxp = w, cx
    shape = deltas.shape
    d = deltas.reshape(shape[:-1] + (-1, 6))
    dx, dy = d[..., 0] / wx, d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(d[..., 3] / wh, BBOX_XFORM_CLIP)
    dxp = d[..., 4] / wx
    dwp = jnp.minimum(d[..., 5] / ww, BBOX_XFORM_CLIP)
    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = jnp.exp(dw) * w[..., None]
    ph = jnp.exp(dh) * h[..., None]
    pcxp = dxp * wp[..., None] + cxp[..., None]
    pwp = jnp.exp(dwp) * wp[..., None]
    out = jnp.stack(
        [
            pcx - 0.5 * pw,
            pcy - 0.5 * ph,
            pcx + 0.5 * pw,
            pcy + 0.5 * ph,
            pcxp - 0.5 * pwp,
            pcxp + 0.5 * pwp,
        ],
        axis=-1,
    )
    return out.reshape(shape)


def split_stereo(box6: jnp.ndarray):
    """(…,6) -> left (…,4), right (…,4) with shared y (inference.py:111-112)."""
    left = box6[..., 0:4]
    right = jnp.stack([box6[..., 4], box6[..., 1], box6[..., 5], box6[..., 3]], -1)
    return left, right


def join_stereo(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """left (…,4) + right (…,4) -> (…,6) keeping left y."""
    return jnp.concatenate([left, right[..., 0:1], right[..., 2:3]], axis=-1)
