"""Per-knob A/B of the fused PointRCNN kernels, one tunnel attach.

Times RPN3D (pointnet2 MSG) and RCNNNet standalone under each knob config:
DISPRCNN_SA_MIN_C0 (the sa_fused engagement gate — scales whose first MLP
width is below it stay on the XLA op-chain path) and DISPRCNN_PALLAS_DISABLE
for the sa/fp/pool families. Env is read at trace time; a fresh jit per
config forces a retrace.

Usage: python tools/ab_stage3.py [--configs name1,name2]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")

# name -> (DISPRCNN_SA_MIN_C0, DISPRCNN_PALLAS_DISABLE, extra-env)
CONFIGS = {
    "default(c0=64)": ("64", "", {}),
    "c0=32": ("32", "", {}),
    "c0=16": ("16", "", {}),
    "c0=1": ("1", "", {}),
    "no_sa": ("64", "sa", {}),
    "no_fp": ("64", "fp", {}),
    "no_pool": ("64", "pool", {}),
    "all_off": ("64", "sa,fp,pool", {}),
    # r4 SA mega-kernel variants (bit-identical outputs; see sa_fused.py).
    # Since r4h the SHIPPED default is xfold+cumsum — every variant row
    # pins XFOLD/RANKS explicitly so its meaning survives default flips.
    "legacy_tri": ("64", "", {"DISPRCNN_SA_XFOLD": "0",
                              "DISPRCNN_SA_RANKS": "tri"}),
    "ranks_cumsum": ("64", "", {"DISPRCNN_SA_XFOLD": "0",
                                "DISPRCNN_SA_RANKS": "cumsum"}),
    "vt_fold": ("64", "", {"DISPRCNN_SA_XFOLD": "0",
                           "DISPRCNN_SA_RANKS": "tri",
                           "DISPRCNN_SA_VT": "fold"}),
    "cumsum+fold": ("64", "", {"DISPRCNN_SA_XFOLD": "0",
                               "DISPRCNN_SA_RANKS": "cumsum",
                               "DISPRCNN_SA_VT": "fold"}),
    # r4e: R ROIs per grid step (pure grid reshape, bit-identical)
    "rows2": ("64", "", {"DISPRCNN_SA_ROWS": "2"}),
    "rows4": ("64", "", {"DISPRCNN_SA_ROWS": "4"}),
    "rows8": ("64", "", {"DISPRCNN_SA_ROWS": "8"}),
    "rows4+fold": ("64", "", {"DISPRCNN_SA_ROWS": "4",
                              "DISPRCNN_SA_VT": "fold"}),
    "rows4+cumsum+fold": ("64", "", {"DISPRCNN_SA_ROWS": "4",
                                     "DISPRCNN_SA_RANKS": "cumsum",
                                     "DISPRCNN_SA_VT": "fold"}),
    # r4f: feature selection via tpu.dynamic_gather instead of the one-hot
    # MXU dot (row-major kernel, no XLA-side transposes at all)
    "gather": ("64", "", {"DISPRCNN_SA_GATHER": "1"}),
    "gather+rows4": ("64", "", {"DISPRCNN_SA_GATHER": "1",
                                "DISPRCNN_SA_ROWS": "4"}),
    # r4h: one-hot-free bisect kernel (binary search on the prefix count)
    "bisect": ("64", "", {"DISPRCNN_SA_GATHER": "bisect"}),
    "bisect+rows4": ("64", "", {"DISPRCNN_SA_GATHER": "bisect",
                                "DISPRCNN_SA_ROWS": "4"}),
    # r4h: xyz rows folded into the feature selection dot (the 9-row g3
    # dot costs a full MXU output row-tile standalone)
    "xfold": ("64", "", {"DISPRCNN_SA_XFOLD": "1"}),
    "xfold+cumsum": ("64", "", {"DISPRCNN_SA_XFOLD": "1",
                                "DISPRCNN_SA_RANKS": "cumsum"}),
    # r5: lane-chunked hardware gather replaces the one-hot selection dot
    # (1.07 of SA0's 1.9 GFLOP/ROI); compare-sum slot indices, slot packs
    # of 128 lanes (sa_fused._kernel_l)
    "lanes": ("64", "", {"DISPRCNN_SA_GATHER": "lanes"}),
    "lanes+rows4": ("64", "", {"DISPRCNN_SA_GATHER": "lanes",
                               "DISPRCNN_SA_ROWS": "4"}),
    "lanes+g16": ("64", "", {"DISPRCNN_SA_GATHER": "lanes",
                             "DISPRCNN_SA_LG16": "1"}),
    "lanes+bisect": ("64", "", {"DISPRCNN_SA_GATHER": "lanes",
                                "DISPRCNN_SA_LSEARCH": "bisect"}),
    "lanes+bisect+g16": ("64", "", {"DISPRCNN_SA_GATHER": "lanes",
                                    "DISPRCNN_SA_LSEARCH": "bisect",
                                    "DISPRCNN_SA_LG16": "1"}),
    # r5b: center-tile split (intra-step build/dot overlap)
    "mt64": ("64", "", {"DISPRCNN_SA_MT": "64"}),
    "mt32": ("64", "", {"DISPRCNN_SA_MT": "32"}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--post-nms", type=int, default=16,
                    help="proposals/ROI feeding the RCNN (reference: 100)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from disprcnn_tpu.models.pointrcnn import rcnn3d, rpn3d
    from disprcnn_tpu.models.pointrcnn.point_rcnn import PointRCNN
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    r, n = 16, 768
    rng = jax.random.PRNGKey(0)
    prcnn = PointRCNN(npoints=n, rcnn_enabled=True, dtype=jnp.bfloat16)
    pts0 = jax.random.normal(rng, (r, n, 3)) * 2.0 + jnp.asarray([0, 0, 20.0])
    ok = jnp.ones((r,), bool)
    ang = jnp.zeros((r,))
    mean = jnp.zeros((r, 3))

    cache = "/root/repo/.cache/profile_vpr.pkl"
    if os.path.exists(cache):
        v = pickle.load(open(cache, "rb"))
    else:
        shapes = jax.eval_shape(
            lambda k, a: prcnn.init(
                {"params": k, "sampling": k}, a, ok, ang, mean, train=False
            ), rng, pts0,
        )
        nprng = np.random.default_rng(0)

        def fill(path, s):
            a = (0.05 * nprng.standard_normal(s.shape)).astype(s.dtype)
            if any("var" in str(getattr(p, "key", "")) for p in path):
                a = np.abs(a) + np.asarray(0.9, s.dtype)
            return a

        v = jax.tree_util.tree_map_with_path(fill, shapes)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        pickle.dump(v, open(cache, "wb"))
    v = jax.tree.map(jnp.asarray, v)
    v, pts = jax.device_put((v, pts0), dev)

    rpn = rpn3d.RPN3D(
        codec_cfg=prcnn.rpn_codec, use_bn=True, npoints=prcnn.sa_npoints,
        dtype=jnp.bfloat16, name="rpn",
    )
    vr = {col: sub["rpn"] for col, sub in v.items() if "rpn" in sub}
    rc = rcnn3d.RCNNNet(dtype=jnp.bfloat16, name="rcnn")
    vc = {col: sub["rcnn"] for col, sub in v.items() if "rcnn" in sub}
    flat = jax.device_put(jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (r * args.post_nms, prcnn.rcnn_num_points, 133)) * 0.5,
        jnp.bfloat16), dev)

    names = [n_ for n_ in args.configs.split(",") if n_.strip()]
    unknown = [n_ for n_ in names if n_ not in CONFIGS]
    if unknown:
        sys.exit(f"unknown --configs {unknown}; choose from {list(CONFIGS)}")
    extra_keys = sorted({k for _, _, ex in CONFIGS.values() for k in ex})
    saved_env = {k: os.environ.get(k)
                 for k in ["DISPRCNN_SA_MIN_C0", "DISPRCNN_PALLAS_DISABLE",
                           *extra_keys]}
    rows = []
    try:
        for name in names:
            c0, dis, extra = CONFIGS[name]
            os.environ["DISPRCNN_SA_MIN_C0"] = c0
            os.environ["DISPRCNN_PALLAS_DISABLE"] = dis
            for k in extra_keys:
                os.environ.pop(k, None)
            os.environ.update(extra)
            try:
                frpn = jax.jit(lambda vv, p, _n=name: rpn.apply(
                    vv, p, train=False)["cls"])
                t_rpn = device_timeit(frpn, vr, pts)
                frc = jax.jit(
                    lambda vv, p, _n=name: rc.apply(vv, p, train=False))
                t_rc = device_timeit(frc, vc, flat)
            except Exception:  # one broken variant must not eat the queue
                import traceback

                traceback.print_exc()
                print(f"{name:>16}: FAILED — continuing", flush=True)
                continue
            rows.append((name, t_rpn, t_rc))
            print(f"{name:>16}: rpn3d {t_rpn:7.2f} ms   rcnn {t_rc:7.2f} ms",
                  flush=True)
    finally:
        for k, b in saved_env.items():
            if b is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = b

    if not rows:
        sys.exit("no config succeeded")
    best_rpn = min(rows, key=lambda x: x[1])
    best_rc = min(rows, key=lambda x: x[2])
    print(f"\nbest rpn3d: {best_rpn[0]} ({best_rpn[1]:.2f} ms); "
          f"best rcnn: {best_rc[0]} ({best_rc[2]:.2f} ms)")


if __name__ == "__main__":
    main()
