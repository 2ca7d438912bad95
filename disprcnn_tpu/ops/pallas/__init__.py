"""Pallas TPU kernels.

DISPRCNN_PALLAS_DISABLE: comma list of kernel-family tags to turn off at
trace time (the XLA fallbacks run instead) — for on-chip bisection when a
kernel that only ever ran in interpret mode meets real Mosaic. Tags:
  conv3d   stride-1 packed trunk conv (+pair/out_repack variants)
  convtrain  train-path stride-1 trunk conv (Pallas fwd + custom_vjp bwd)
  roipool  fused 3D ROI pooling (mask + first-k-cycled gather)
  s2       stride-2 packed conv
  deconv   packed transposed conv
  cv       fused cost-volume + first conv
  cvdec    decomposed cost-volume conv (2D-conv identity, ops/cv_conv.py —
           XLA, not Pallas, but A/B'd through the same switch; when ON it
           replaces BOTH the 'cv' Pallas kernel and the train-path
           volume-build+conv). Also geometry-gated: engages only when
           W*D >= DISPRCNN_CVDEC_MIN_WD (default 512) — the op-count storm
           of its column corrections loses at tiny shapes on every backend;
           DISPRCNN_PALLAS_ENABLE=cvdec bypasses the floor.
  cl1      Pallas dg=1 classif-head conv (single-output-channel trunk conv)
  wconv    W-packed tower conv
  sa       whole-scale ball+gather+MLP+max
  satrain  train-path fused SA (eval mega-kernel fwd + XLA-oracle
           custom_vjp bwd; BN-free scales only, i.e. the RCNN stage)
  pool     grouped-MLP+max (SharedMLP._fused_pool)
  softargmin  fused upsample+softmax+soft-argmin
  fp       fused 3-NN interpolate + MLP (FPModule)

Families measured as net LOSSES on-chip default to OFF and can be forced
back on with DISPRCNN_PALLAS_ENABLE (same comma-list syntax) for re-runs of
the A/B ledger (tools/ab_psmnet.py).
"""
from __future__ import annotations

import os

# Measured on TPU v5e, 2026-08-18 (tools/ab_psmnet.py, full PSMNet fwd,
# 16x224^2 ROIs, per-family deltas vs all-on):
#   conv3d  +8.15 ms when disabled  -> keep ON
#   cv      +1.37 ms when disabled  -> keep ON
#   deconv  +0.09 ms when disabled  -> keep ON (neutral)
#   s2      -6.16 ms when disabled  -> OFF (XLA's strided conv is faster)
#   wconv   -3.54 ms when disabled  -> OFF (XLA's 2D tower conv is faster)
#   softargmin -0.66 ms when disabled -> OFF
_DEFAULT_OFF = {"s2", "wconv", "softargmin"}


def _env_set(name: str) -> set[str]:
    raw = os.environ.get(name, "")
    return {t.strip() for t in raw.split(",") if t.strip()}


def kernel_disabled(tag: str) -> bool:
    if tag in _env_set("DISPRCNN_PALLAS_DISABLE"):
        return True
    return tag in _DEFAULT_OFF and tag not in _env_set("DISPRCNN_PALLAS_ENABLE")


def kernel_forced(tag: str) -> bool:
    """True when the family is force-enabled via DISPRCNN_PALLAS_ENABLE —
    callers with geometry gates (cvdec's W*D floor) bypass them, so A/B
    ledgers and parity tests exercise the real path at any shape."""
    return tag in _env_set("DISPRCNN_PALLAS_ENABLE")
