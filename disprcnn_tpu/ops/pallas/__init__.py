"""Pallas TPU kernels.

DISPRCNN_PALLAS_DISABLE: comma list of kernel-family tags to turn off at
trace time (the XLA fallbacks run instead) — for on-chip bisection when a
kernel that only ever ran in interpret mode meets real Mosaic. Tags:
  conv3d   stride-1 packed trunk conv (+pair/out_repack variants)
  roipool  fused 3D ROI pooling (mask + first-k-cycled gather)
  s2       stride-2 packed conv
  deconv   packed transposed conv
  cv       fused cost-volume + first conv
  wconv    W-packed tower conv
  sa       whole-scale ball+gather+MLP+max
  pool     grouped-MLP+max (SharedMLP._fused_pool)
  softargmin  fused upsample+softmax+soft-argmin
  fp       fused 3-NN interpolate + MLP (FPModule)
"""
from __future__ import annotations

import os


def kernel_disabled(tag: str) -> bool:
    raw = os.environ.get("DISPRCNN_PALLAS_DISABLE", "")
    return tag in {t.strip() for t in raw.split(",") if t.strip()}
