"""A/B the roipool3d fused gather dot width at the reference eval
geometry (16 frustums x 100 proposals = 1600 boxes, N=768, S=512):
DISPRCNN_ROIPOOL_F32DOT=1 (pre-r5 f32 dot) vs the r5 bf16 split dot.

Times pool_rcnn_inputs (the profile_stage3 'roipool3d' segment) with a
fresh jit per config so the env flip retraces.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frustums", type=int, default=16)
    ap.add_argument("--proposals", type=int, default=100)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from disprcnn_tpu.models.pointrcnn import rcnn3d
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    r = np.random.default_rng(0)
    fr, m, n = args.frustums, args.proposals, 768
    xyz = jnp.asarray(r.normal(size=(fr, n, 3)) * 2
                      + np.array([0, 0, 20.0]), jnp.float32)
    feats = jnp.asarray(r.normal(size=(fr, n, 128)), jnp.bfloat16)
    seg = jnp.asarray(r.uniform(size=(fr, n)) > 0.5, jnp.float32)
    rois = jnp.asarray(np.concatenate(
        [r.normal(size=(fr, m, 3)) * 2 + np.array([0, 0, 20.0]),
         np.abs(r.normal(size=(fr, m, 3))) * 2 + 1.0,
         r.normal(size=(fr, m, 1))], axis=-1), jnp.float32)
    xyz, feats, seg, rois = jax.device_put((xyz, feats, seg, rois), dev)

    for name, env in (("bf16_split", "0"), ("f32dot", "1")):
        os.environ["DISPRCNN_ROIPOOL_F32DOT"] = env
        f = jax.jit(lambda x, ff, s_, ro, _n=name: rcnn3d.pool_rcnn_inputs(
            x, ff, s_, ro, num_points=512)[0])
        t = device_timeit(f, xyz, feats, seg, rois)
        print(f"{name:>12}: {t:7.2f} ms  (pool_rcnn_inputs, "
              f"{fr}x{m} boxes)", flush=True)
    os.environ.pop("DISPRCNN_ROIPOOL_F32DOT", None)


if __name__ == "__main__":
    main()
