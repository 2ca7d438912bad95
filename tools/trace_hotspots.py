"""Per-op trace capture for the current perf blind spots, one tunnel attach.

Captures jax.profiler traces (parsed by tools/trace_report.py — the axon
tunnel has no TensorBoard) for:
  - the full 2D detector (where do the RPN+heads ~7.8 ms go: top_k? NMS?
    poolers? box-head MLPs?)
  - the PSMNet siamese feature tower alone (measured well below conv
    roofline previously)
  - the RPN3D pointnet (MSG SA stack; ~22% MFU)

Usage: python tools/trace_hotspots.py [--skip 2d,tower,rpn3d]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def log(msg):
    print(msg, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: 2d,tower,rpn3d")
    ap.add_argument("--top", type=int, default=35)
    skip = set(ap.parse_args().skip.split(","))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tools.trace_report import capture, report

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    rng = jax.random.PRNGKey(0)

    if "2d" not in skip:
        from disprcnn_tpu.models.detector.disprcnn import DispRCNN

        h, w, d = 384, 1248, 16
        model2d = DispRCNN(
            body="R-101", pre_nms_top_n_test=6000, post_nms_top_n_test=300,
            max_det=d, detections_per_img=d, dtype=jnp.bfloat16,
        )
        with jax.default_device(cpu):
            left0 = jnp.zeros((1, h, w, 3), jnp.float32)
            v2d = jax.jit(
                lambda k, a: model2d.init(
                    {"params": k, "sampling": k}, a, a, train=False)
            )(rng, left0)
        v2d = jax.device_put(v2d, dev)
        img = jax.device_put(
            jnp.asarray(
                np.random.default_rng(0).uniform(0, 1, (1, h, w, 3)),
                jnp.float32),
            dev,
        )
        f2d = jax.jit(lambda v, l, r: model2d.apply(v, l, r, train=False)[
            "detections"].left)
        log("=== trace: full 2D detector (R-101, 6000->300) ===")
        capture(f2d, v2d, img, img, trace_dir="/tmp/tr_2d")
        report("/tmp/tr_2d", top=ap.parse_args().top)

    if "tower" not in skip:
        from disprcnn_tpu.models.psmnet.psmnet import FeatureExtraction

        fe = FeatureExtraction(dtype=jnp.bfloat16)
        with jax.default_device(cpu):
            crops0 = jnp.zeros((32, 224, 224, 3), jnp.float32)
            vfe = jax.jit(lambda k, a: fe.init(k, a, train=False))(rng, crops0)
        vfe = jax.device_put(vfe, dev)
        crops = jax.device_put(
            jnp.asarray(
                np.random.default_rng(1).uniform(-2, 2, (32, 224, 224, 3)),
                jnp.float32),
            dev,
        )
        ffe = jax.jit(lambda v, a: fe.apply(v, a, train=False))
        log("=== trace: PSMNet feature tower (32x224^2) ===")
        capture(ffe, vfe, crops, trace_dir="/tmp/tr_tower")
        report("/tmp/tr_tower", top=ap.parse_args().top)

    if "trunk" not in skip:
        # Full PSMNet at production geometry (16x224^2, D=[-48,48)). The
        # segment profile says hg = 12.7 ms while its conv sites sum to ~5 —
        # this trace attributes the remaining glue (layout moves, residual
        # adds, repacks between packed-G layouts) per fusion.
        import pickle

        from disprcnn_tpu.models.psmnet.psmnet import PSMNet

        psm = PSMNet(maxdisp=48, mindisp=-48, dtype=jnp.bfloat16)
        d = 16
        cache = "/root/repo/.cache/profile_vpsm.pkl"
        with open(cache, "rb") as f:  # written by tools/profile_psmnet.py
            vpsm = pickle.load(f)
        vpsm = jax.device_put(jax.tree.map(jnp.asarray, vpsm), dev)
        crops = jax.device_put(
            jnp.asarray(
                np.random.default_rng(0).uniform(-1, 1, (d, 224, 224, 3)),
                jnp.float32),
            dev,
        )
        fps = jax.jit(lambda v, a, b: psm.apply(v, a, b, train=False))
        log("=== trace: full PSMNet (16x224^2) ===")
        capture(fps, vpsm, crops, crops, trace_dir="/tmp/tr_trunk")
        report("/tmp/tr_trunk", top=ap.parse_args().top)

    if "rpn3d" not in skip:
        from disprcnn_tpu.models.pointrcnn.rpn3d import RPN3D

        r, n = 16, 768
        rpn = RPN3D(npoints=(768, 512, 256, 64), dtype=jnp.bfloat16)
        pts = jax.random.normal(rng, (r, n, 3)) * 2.0 + jnp.asarray([0, 0, 20.0])
        with jax.default_device(cpu):
            vr = jax.jit(lambda k, a: rpn.init(
                {"params": k}, a, train=False))(rng, jnp.zeros((r, n, 3)))
        vr = jax.device_put(vr, dev)
        pts = jax.device_put(pts, dev)
        fr = jax.jit(lambda v, a: rpn.apply(v, a, train=False))
        log("=== trace: RPN3D pointnet (16x768) ===")
        capture(fr, vr, pts, trace_dir="/tmp/tr_rpn3d")
        report("/tmp/tr_rpn3d", top=ap.parse_args().top)


if __name__ == "__main__":
    main()
