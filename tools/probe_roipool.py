"""One-off probe: reproduce + localize the roipool3d_fused on-chip mismatch
seen in measure_all's kernel_smoke (max rel err exactly 1.0 => fused output
ZERO where the XLA fallback has values).

Replays kernel_smoke's exact RNG stream (np.default_rng(0), same draw shapes
in order) so rp_pts/rp_f match the failing run, then reports per-(batch,box)
error, per-slot zero-rows, and the in-box counts — enough to tell whether
the bad slots are tail-cycled (slot >= cnt) or first-pass.
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

r = np.random.default_rng(0)
# replay the pre-roipool draw sequence from tools/kernel_smoke.py
for shape in [(96, 56, 56, 128), (3, 3, 3, 32, 32),               # conv3d
              (96, 28, 28, 128),                                   # multirow
              (3, 3, 3, 32, 64), (96, 56, 56, 128),                # s2
              (3, 3, 3, 64, 64), (96, 14, 14, 64),                 # deconv
              (3, 3, 3, 64, 32), (16, 56, 56, 32), (16, 56, 56, 32),  # cv
              (3, 3, 32, 32), (32, 112, 28, 128),                  # wconv
              (128, 128), (128, 128), (256, 512, 3), (256, 128, 3),  # sa
              (256, 512, 128), (3, 128),
              (384, 128), (16, 768, 3), (16, 256, 3),              # fp
              (16, 256, 256), (16, 768, 128)]:
    r.normal(size=shape)

# roipool draws
boxes = np.tile(np.array([[0.0, 1, 0, 2, 3, 3, 0.4]], np.float32), (16, 16, 1))
rp_pts_np = r.uniform(-4, 4, (16, 768, 3))
rp_f_np = r.normal(size=(16, 768, 130))

dev = jax.devices()[0]
rp_pts = jax.device_put(jnp.asarray(rp_pts_np, jnp.float32), dev)
rp_f = jax.device_put(jnp.asarray(rp_f_np, jnp.float32), dev)
rp_b = jax.device_put(jnp.asarray(boxes, jnp.float32), dev)

import os

from disprcnn_tpu.ops.pallas.roipool3d_fused import roipool3d_fused
from disprcnn_tpu.ops.roipool3d import roipool3d

got, ge = roipool3d_fused(rp_pts, rp_f, rp_b, 512)
got = np.asarray(got, np.float32)
os.environ["DISPRCNN_PALLAS_DISABLE"] = "roipool"
want, we = roipool3d(rp_pts, rp_f, rp_b, sampled_pts_num=512)
want = np.asarray(want, np.float32)
os.environ["DISPRCNN_PALLAS_DISABLE"] = ""

rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
print("max rel:", rel.max(), flush=True)
if rel.max() < 1e-3:
    print("DID NOT REPRODUCE", flush=True)
else:
    # oracle in-box count per (b, m) on the host
    def count_in(pts, b7):
        cx, by, cz, h, w_, l, ry = b7
        cy = by - h / 2
        dx, dy, dz = pts[:, 0] - cx, pts[:, 1] - cy, pts[:, 2] - cz
        xr = dx * np.cos(ry) - dz * np.sin(ry)
        zr = dx * np.sin(ry) + dz * np.cos(ry)
        return int(((np.abs(dx) <= 10) & (np.abs(dy) <= h / 2)
                    & (np.abs(dz) <= 10)
                    & (np.abs(xr) <= l / 2) & (np.abs(zr) <= w_ / 2)).sum())

    per_box = rel.max(axis=(2, 3))  # (16, 16)
    bad = np.argwhere(per_box > 0.05)
    print("bad (b,m) count:", len(bad), "first:", bad[:8].tolist(), flush=True)
    for b, m in bad[:4]:
        cnt = count_in(rp_pts_np[b], boxes[b, m])
        slot_bad = np.nonzero(rel[b, m].max(axis=-1) > 0.05)[0]
        got_zero = np.all(got[b, m] == 0, axis=-1)
        print(f"  b={b} m={m} cnt={cnt} bad_slots={slot_bad[:12].tolist()}"
              f" n_bad={len(slot_bad)} got_zero_rows={int(got_zero.sum())}",
              flush=True)

os._exit(0)
