"""PSMNet stage split: siamese feature tower vs cost-volume trunk.

Times (a) FeatureExtraction on the 32-crop stereo batch, (b) the full PSMNet
forward, attributing the difference to the packed 3D trunk + classif +
upsample/soft-argmin.

Usage: python tools/profile_psmnet.py
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from disprcnn_tpu.models.psmnet.psmnet import PSMNet, FeatureExtraction
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)
    psm = PSMNet(maxdisp=48, mindisp=-48, dtype=jnp.bfloat16)
    d = 16

    cache = "/root/repo/.cache/profile_vpsm.pkl"
    if os.path.exists(cache):
        log("loading cached variables...")
        with open(cache, "rb") as f:
            vpsm = pickle.load(f)
    else:
        log("synthesizing variables from eval_shape...")
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

    feat = FeatureExtraction(dtype=jnp.bfloat16)
    vfe = {col: s["feature_extraction"] for col, s in vpsm.items()
           if "feature_extraction" in s}
    ffe = jax.jit(lambda v, a, b: feat.apply(v, jnp.concatenate([a, b]), False))
    log("timing feature tower (2x16 crops)...")
    t_fe = device_timeit(ffe, vfe, crops, crops)

    fpsm = jax.jit(lambda v, a, b: psm.apply(v, a, b, train=False))
    log("timing full psmnet...")
    t_full = device_timeit(fpsm, vpsm, crops, crops)

    if "--segments" in sys.argv:
        # jitted-prefix differencing over PSMNet.profile_stage early exits:
        # each prefix recompiles the graph cut after that segment, so
        # t[k] - t[k-1] attributes the segment's cost (incl. fusion effects
        # at the cut boundary — treat small negatives as noise).
        stages = ["tower", "dres", "hg", "classif", None]
        prev_t = 0.0
        log("timing jitted prefixes (tower/dres/hg/classif/full)...")
        for st in stages:
            f = jax.jit(lambda v, a, b, _st=st: psm.apply(
                v, a, b, train=False, profile_stage=_st))
            t = device_timeit(f, vpsm, crops, crops)
            name = st or "regress(full)"
            print(f"prefix {name:14s}: {t:8.2f} ms  (+{t - prev_t:7.2f} ms segment)")
            prev_t = t
        return

    from disprcnn_tpu.utils.benchmarking import compiled_flops, peak_flops

    g_fe = compiled_flops(
        lambda v, a, b: feat.apply(v, jnp.concatenate([a, b]), False), vfe, crops, crops)
    g_full = compiled_flops(
        lambda v, a, b: psm.apply(v, a, b, train=False), vpsm, crops, crops)
    peak = peak_flops()

    def mfu(g, ms):
        return g / (ms * 1e-3) / peak * 100 if peak and ms else 0.0

    print(f"feature tower: {t_fe:8.2f} ms  {g_fe / 1e9:8.1f} GFLOP  MFU {mfu(g_fe, t_fe):5.1f}%")
    print(f"full psmnet:   {t_full:8.2f} ms  {g_full / 1e9:8.1f} GFLOP  MFU {mfu(g_full, t_full):5.1f}%")
    t_tr, g_tr = t_full - t_fe, g_full - g_fe
    print(f"trunk+classif: {t_tr:8.2f} ms  {g_tr / 1e9:8.1f} GFLOP  MFU {mfu(g_tr, t_tr):5.1f}% (derived)")

    if os.environ.get("TRACE"):
        from tools.trace_report import capture, report

        log("capturing per-op trace of the full psmnet forward...")
        capture(fpsm, vpsm, crops, crops, trace_dir="/tmp/psm_trace", iters=5)
        report("/tmp/psm_trace", top=40)
        from tools.trace_report import report_by_source

        hlo = fpsm.lower(vpsm, crops, crops).compile().as_text()
        report_by_source("/tmp/psm_trace", hlo, top=40)


if __name__ == "__main__":
    main()
