"""Kernel-level A/B of sa_ball_mlp_max variants at the EXACT RCNN SA
geometries of the reference eval budget (1600 ROIs = 16 frustums x 100
proposals):

  SA0: B=1600, N=512, M=128, S=64, C0=128, mlps 128->128->128
  SA1: B=1600, N=128, M=32,  S=64, C0=128, mlps 128->128->256

ab_stage3 times the whole RCNNNet (includes FPS/xyz-up/heads and XLA
glue); this isolates the mega-kernel itself so a variant's win/loss is
attributed to the kernel, not the surroundings.

Usage: python tools/ab_sa_kernel.py [--configs a,b] [--rois 1600]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

CONFIGS = {
    "default": {},
    "legacy_tri": {"DISPRCNN_SA_XFOLD": "0", "DISPRCNN_SA_RANKS": "tri"},
    # r5a measured (2026-08-20): lanes 22.29/7.16 vs default 21.79/4.79 —
    # retired (see kernel_smoke note); g16 rejected by Mosaic (bitwidth).
    "lanes": {"DISPRCNN_SA_GATHER": "lanes"},
    # r5b: mt-split — the default mt=128 runs ONE center-tile per grid
    # step, so the (n, s*mt) one-hot build has nothing to overlap with;
    # 2-4 tiles expose independent build->dot chains to the scheduler
    "mt64": {"DISPRCNN_SA_MT": "64"},
    "mt32": {"DISPRCNN_SA_MT": "32"},
    "mt64+rows2": {"DISPRCNN_SA_MT": "64", "DISPRCNN_SA_ROWS": "2"},
    # r5b follow-up: the cumsum scan's sublane-concat fails Mosaic layout
    # rules at mt<128 ("offset mismatch on non-concat dimension") — pair
    # mt-split with tri-matmul ranks instead; rows2 alone won SA1 -9%
    "mt64tri": {"DISPRCNN_SA_MT": "64", "DISPRCNN_SA_RANKS": "tri"},
    "mt32tri": {"DISPRCNN_SA_MT": "32", "DISPRCNN_SA_RANKS": "tri"},
    "rows2": {"DISPRCNN_SA_ROWS": "2"},
    # r5i trace: the xfold HBM concat is the biggest glue fusion (1.78 ms)
    "vsep": {"DISPRCNN_SA_VSEP": "1"},
    "rows2+mt64tri": {"DISPRCNN_SA_ROWS": "2", "DISPRCNN_SA_MT": "64",
                      "DISPRCNN_SA_RANKS": "tri"},
}

GEOMS = {
    "SA0": dict(n=512, m=128, s=64, c0=128, cos=(128, 128), radius=0.2),
    "SA1": dict(n=128, m=32, s=64, c0=128, cos=(128, 256), radius=0.4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--rois", type=int, default=1600)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from disprcnn_tpu.ops.pallas.sa_fused import sa_ball_mlp_max
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    r = np.random.default_rng(0)
    b = args.rois

    cases = {}
    for gname, g in GEOMS.items():
        n, m, s, c0 = g["n"], g["m"], g["s"], g["c0"]
        ws = []
        cin = c0
        for co in g["cos"]:
            ws.append((jnp.asarray(r.normal(size=(cin, co)) * 0.1,
                                   jnp.float32),
                       jnp.zeros((co,), jnp.float32)))
            cin = co
        xyz = jnp.asarray(r.normal(size=(b, n, 3)) * 0.3, jnp.float32)
        ctr = jnp.asarray(
            np.ascontiguousarray(np.asarray(xyz)[:, :m]), jnp.float32)
        arrs = jax.device_put(
            (xyz, ctr,
             jnp.asarray(r.normal(size=(b, n, c0)), jnp.bfloat16),
             jnp.asarray(r.normal(size=(3, c0)) * 0.1, jnp.float32),
             jnp.ones((c0,), jnp.float32), jnp.zeros((c0,), jnp.float32),
             tuple(ws)), dev)
        cases[gname] = (arrs, float(g["radius"]), s)

    names = [x for x in args.configs.split(",") if x.strip()]
    saved = {k: os.environ.get(k)
             for cfg in CONFIGS.values() for k in cfg}
    rows = []
    try:
        for name in names:
            env = CONFIGS[name]
            for k in saved:
                os.environ.pop(k, None)
            os.environ.update(env)
            t = {}
            for gname, (arrs, radius, s_) in cases.items():
                try:
                    # radius/s are STATIC kernel params — close over them
                    # (as args they would arrive traced through the jit)
                    t[gname] = device_timeit(
                        lambda *a, _r=radius, _s=s_: sa_ball_mlp_max(
                            *a, _r, _s), *arrs)
                except Exception:  # noqa: BLE001
                    import traceback

                    traceback.print_exc()
                    t[gname] = float("nan")
            rows.append((name, t))
            print(f"{name:>18}: " + "  ".join(
                f"{gn} {tv:7.2f} ms" for gn, tv in t.items()), flush=True)
    finally:
        for k, v_ in saved.items():
            if v_ is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v_


if __name__ == "__main__":
    main()
