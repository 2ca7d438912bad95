"""One-off probe: localize the on-chip cost_volume_conv_bn mismatch.

Runs the fused kernel at the kernel_smoke geometry and prints per-(gi)
max rel error vs the XLA oracle, to see whether the bad groups are the
negative-disparity ones (pltpu.roll dynamic-negative-shift suspicion).
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from disprcnn_tpu.ops.conv3d_packed import conv3d_packed_r4, pack_kernel
from disprcnn_tpu.ops.pallas.packed_conv import cost_volume_conv_bn
from disprcnn_tpu.models.psmnet.psmnet import build_cost_volume_packed

r = np.random.default_rng(0)
dev = jax.devices()[0]
put = lambda a: jax.device_put(jnp.asarray(a, jnp.bfloat16), dev)

kcv = put(r.normal(size=(3, 3, 3, 64, 32)) * 0.1)
lf = put(r.normal(size=(4, 56, 56, 32)))
rf = put(r.normal(size=(4, 56, 56, 32)))
one = jax.device_put(jnp.ones(128, jnp.float32), dev)
zero = jax.device_put(jnp.zeros(128, jnp.float32), dev)

dg, g, mind4 = 6, 4, -12
got = np.asarray(cost_volume_conv_bn(
    lf, rf, pack_kernel(kcv[:, :, :, :32, :], 4),
    pack_kernel(kcv[:, :, :, 32:, :], 4), one, zero, dg, g, mind4,
    relu=True), np.float32)
cvp = build_cost_volume_packed(lf, rf, mind4, mind4 + dg * g, g)
want = np.asarray(jnp.maximum(conv3d_packed_r4(cvp, kcv, 4, dg), 0),
                  np.float32)

b = 4
gotr = got.reshape(b, dg, 56, 56, 128)
wantr = want.reshape(b, dg, 56, 56, 128)
for gi in range(dg):
    e = np.abs(gotr[:, gi] - wantr[:, gi]) / np.maximum(np.abs(wantr[:, gi]), 1.0)
    # also locate where along W the error sits
    ew = e.max(axis=(0, 1, 3))  # (W,)
    print(f"gi={gi} d_base={mind4 + gi * g:+d}: maxrel={e.max():.3e} "
          f"bad_w_cols={np.nonzero(ew > 0.05)[0][:8]}", flush=True)

import os

os._exit(0)
