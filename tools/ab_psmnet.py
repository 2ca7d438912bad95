"""Per-family A/B of the fused PSMNet kernels, one tunnel attach.

The round-3 pipeline profile showed full PSMNet at 59 ms/16 ROIs with all
fused families on, vs ~34 ms measured unfused in round 2 — some family is a
large net LOSS at the production geometry. This times the full PSMNet
forward under each DISPRCNN_PALLAS_DISABLE config (env is read at trace
time; a fresh jit per config forces retrace) and prints a ledger.

Usage: python tools/ab_psmnet.py [--rois 16] [--configs name1,name2]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")

# Each config: (DISPRCNN_PALLAS_DISABLE, DISPRCNN_PALLAS_ENABLE). The
# force-enable configs set ENABLE="s2,wconv,softargmin" so the disable list
# is the only engagement variable; `shipping` measures the true library
# default (ENABLE empty, _DEFAULT_OFF families off).
_FORCE = "s2,wconv,softargmin"
CONFIGS = {
    "all_on": ("", _FORCE),
    "no_conv3d": ("conv3d", _FORCE),
    "no_s2": ("s2", _FORCE),
    "no_deconv": ("deconv", _FORCE),
    "no_cv": ("cv", _FORCE),
    "no_wconv": ("wconv", _FORCE),
    "no_softargmin": ("softargmin", _FORCE),
    "no_cl1": ("cl1", _FORCE),
    "trunk_off": ("conv3d,s2,deconv,cv", _FORCE),
    "all_off": ("conv3d,s2,deconv,cv,wconv,softargmin,cl1", _FORCE),
    "best": ("s2,wconv,softargmin", _FORCE),
    "best_plus_deconv_off": ("s2,wconv,softargmin,deconv", _FORCE),
    "best_no_cl1": ("s2,wconv,softargmin,cl1", _FORCE),
    # round 4: default now = site-gated kernels, Pallas cv first (eval TPU)
    "default": ("", _FORCE),
    "no_cvdec": ("cvdec", _FORCE),           # the Pallas cv kernel path
    "no_cvdec_no_cv": ("cvdec,cv", _FORCE),  # XLA split volume build + conv
    # the true library default: _DEFAULT_OFF families actually off
    "shipping": ("", ""),
    "shipping_cvdec": ("cv", ""),  # shipping but cvdec instead of Pallas cv
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=16)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--min-hw", default=None,
                    help="override DISPRCNN_CONV3D_MIN_HW (per-site gate)")
    args = ap.parse_args()
    if args.min_hw is not None:
        os.environ["DISPRCNN_CONV3D_MIN_HW"] = args.min_hw

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from disprcnn_tpu.models.psmnet.psmnet import PSMNet
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    psm = PSMNet(maxdisp=48, mindisp=-48, dtype=jnp.bfloat16)
    d = args.rois

    cache = "/root/repo/.cache/profile_vpsm.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            vpsm = pickle.load(f)
    else:
        crops0 = jnp.zeros((d, 224, 224, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda k, a: psm.init({"params": k}, a, a, train=False), rng, crops0
        )
        nprng = np.random.default_rng(0)

        def fill(path, s):
            a = (0.05 * nprng.standard_normal(s.shape)).astype(s.dtype)
            if any("var" in str(getattr(p, "key", "")) for p in path):
                a = np.abs(a) + np.asarray(0.9, s.dtype)
            return a

        vpsm = jax.tree_util.tree_map_with_path(fill, shapes)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump(vpsm, f)
    vpsm = jax.device_put(jax.tree.map(jnp.asarray, vpsm), dev)
    crops = jax.device_put(
        jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (d, 224, 224, 3)),
                    jnp.float32), dev)

    base = None
    # save/restore BOTH env vars: leaking ENABLE="s2,wconv,softargmin" into
    # a chained measurement session silently ran every later step with the
    # default-OFF families ON (contaminated the whole 2026-08-19 r4b queue:
    # +~10 ms/fwd on PSMNet, misread as a slower chip)
    saved = {k: os.environ.get(k)
             for k in ("DISPRCNN_PALLAS_DISABLE", "DISPRCNN_PALLAS_ENABLE")}
    try:
        for name in args.configs.split(","):
            disable, enable = CONFIGS[name]
            os.environ["DISPRCNN_PALLAS_DISABLE"] = disable
            os.environ["DISPRCNN_PALLAS_ENABLE"] = enable
            fpsm = jax.jit(lambda v, a, b: psm.apply(v, a, b, train=False))
            print(f"--- {name:14s} (disable='{disable}' enable='{enable}') "
                  "compiling...", flush=True)
            try:
                ms = device_timeit(fpsm, vpsm, crops, crops)
            except Exception as e:  # noqa: BLE001
                print(f"    FAILED: {e!r:.200}", flush=True)
                continue
            if base is None:
                base = ms
            print(f"    {ms:8.2f} ms  ({ms - base:+6.2f} vs first)",
                  flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    import os as _os

    _os._exit(0)


if __name__ == "__main__":
    main()
