"""Per-stage timing breakdown of the bench.py pipeline on the real chip.

Times each stage under its own jit (2D detector, PSMNet on the ROI batch,
pseudo-LiDAR lift, PointRCNN) so the ~N ms/pair of the fused pipeline can be
attributed. Optionally writes a jax.profiler trace for xprof.

Usage: python tools/profile_pipeline.py [--trace-dir /tmp/trace]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=20, warmup=2):
    # jax.block_until_ready is a NO-OP over the axon tunnel; host readback is
    # the only reliable sync (utils/benchmarking.py).
    from disprcnn_tpu.utils.benchmarking import device_timeit

    return device_timeit(fn, *args, n=n, warmup=warmup)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--max-det", type=int, default=16)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from disprcnn_tpu.models.detector.disprcnn import DispRCNN
    from disprcnn_tpu.models.detector.disprcnn3d import (
        DispRCNN3D, crop_and_normalize, width_aligned_crop_boxes,
    )
    from disprcnn_tpu.models.pointrcnn import lift
    from disprcnn_tpu.models.pointrcnn.point_rcnn import PointRCNN
    from disprcnn_tpu.models.psmnet.psmnet import PSMNet
    from disprcnn_tpu.structures.stereo import StereoBoxes

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    h, w = 384, 1248
    d = args.max_det
    rng = jax.random.PRNGKey(0)

    model2d = DispRCNN(
        body="R-101", pre_nms_top_n_test=6000, post_nms_top_n_test=300,
        max_det=d, detections_per_img=d, dtype=jnp.bfloat16,
    )
    psm = PSMNet(maxdisp=48, mindisp=-48, dtype=jnp.bfloat16)
    prcnn = PointRCNN(npoints=768, rcnn_enabled=True, dtype=jnp.bfloat16)

    with jax.default_device(cpu):
        left0 = jnp.zeros((1, h, w, 3), jnp.float32)
        v2d = jax.jit(
            lambda k, a: model2d.init({"params": k, "sampling": k}, a, a, train=False)
        )(rng, left0)
        crops0 = jnp.zeros((d, 224, 224, 3), jnp.float32)
        vpsm = jax.jit(lambda k, a: psm.init({"params": k}, a, a, train=False))(rng, crops0)
        pts0 = jnp.zeros((d, 768, 3), jnp.float32)
        vpr = jax.jit(
            lambda k, a: prcnn.init(
                {"params": k, "sampling": k}, a,
                jnp.ones((d,), bool), jnp.zeros((d,)), jnp.zeros((d, 3)),
                train=False,
            )
        )(rng, pts0)

    v2d, vpsm, vpr = jax.device_put((v2d, vpsm, vpr), dev)
    img = jax.device_put(
        jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, h, w, 3)), jnp.float32),
        dev,
    )

    lb = jnp.tile(jnp.asarray([[100.0, 150, 400, 350]]), (d, 1))
    rb = jnp.tile(jnp.asarray([[80.0, 150, 380, 350]]), (d, 1))
    bi = jnp.zeros((d,), jnp.int32)
    masks = jnp.full((d, 28, 28), 0.9)
    calib1 = {k: jnp.full((d,), v) for k, v in
              dict(fu=721.5, fv=721.5, cu=w / 2, cv=h / 2, tx=0.0, ty=0.0, fuxb=389.6).items()}

    from disprcnn_tpu.utils.benchmarking import compiled_flops, peak_flops

    t = {}
    fl = {}

    f2d = jax.jit(lambda v, l, r: model2d.apply(v, l, r, train=False)["detections"].left)
    t["2d_detector"] = timeit(f2d, v2d, img, img)
    fl["2d_detector"] = compiled_flops(f2d, v2d, img, img)

    fcrop = jax.jit(lambda l, r: (
        crop_and_normalize(l, width_aligned_crop_boxes(lb, rb)[0], bi, 224),
        crop_and_normalize(r, width_aligned_crop_boxes(lb, rb)[1], bi, 224),
    ))
    t["roi_crop"] = timeit(fcrop, img, img)
    fl["roi_crop"] = compiled_flops(fcrop, img, img)
    lc, rc = fcrop(img, img)

    fpsm = jax.jit(lambda v, a, b: psm.apply(v, a, b, train=False))
    t["psmnet_rois"] = timeit(fpsm, vpsm, lc, rc)
    fl["psmnet_rois"] = compiled_flops(fpsm, vpsm, lc, rc)
    disp = fpsm(vpsm, lc, rc)

    def flift(disp, masks):
        pts_cand, ok = lift.roi_points_candidates(
            disp, masks, lb, rb, calib1["fu"], calib1["fv"], calib1["cu"],
            calib1["cv"], calib1["tx"], calib1["ty"], calib1["fuxb"],
            grid=112, mask_thresh=0.5, min_depth=0.0, max_depth=160.0,
        )
        pts, has = lift.sample_fixed_points(jax.random.PRNGKey(1), pts_cand, ok, 768)
        ang = lift.canonical_angles(lb, float(w), calib1["fu"])
        pts_c, mean = lift.canonicalize(pts, ang)
        return pts_c, has, ang, mean

    flift_j = jax.jit(flift)
    t["lift"] = timeit(flift_j, disp, masks)
    fl["lift"] = compiled_flops(flift, disp, masks)
    pts_c, has, ang, mean = flift_j(disp, masks)

    fpr = jax.jit(
        lambda v, p, ok, a, m: prcnn.apply(
            v, p, ok, a, m, train=False, rngs={"sampling": jax.random.PRNGKey(7)}
        )["box3d"]
    )
    t["pointrcnn"] = timeit(fpr, vpr, pts_c, has, ang, mean)
    fl["pointrcnn"] = compiled_flops(fpr, vpr, pts_c, has, ang, mean)

    total = sum(t.values())
    peak = peak_flops()
    print(f"{'stage':>14}  {'ms':>8}  {'%':>5}  {'GFLOP':>8}  {'TFLOP/s':>8}  {'MFU%':>5}")
    for k, v in t.items():
        g = fl.get(k, 0.0)
        tf = g / (v * 1e-3) / 1e12 if v else 0.0
        mfu = tf * 1e12 / peak * 100 if peak else 0.0
        print(f"{k:>14}  {v:8.2f}  {v / total * 100:5.1f}  {g / 1e9:8.1f}  {tf:8.2f}  {mfu:5.1f}")
    gtot = sum(fl.values())
    print(
        f"{'total':>14}  {total:8.2f}  -> {1000.0 / total:.2f} pairs/s (sum of stages), "
        f"{gtot / 1e9:.1f} GFLOP/pair, MFU {gtot / (total * 1e-3) / peak * 100 if peak else 0:.1f}%"
    )

    if args.trace_dir:
        import jax.profiler

        with jax.profiler.trace(args.trace_dir):
            for _ in range(5):
                out = f2d(v2d, img, img)
                lc, rc = fcrop(img, img)
                disp = fpsm(vpsm, lc, rc)
                pts_c, has, ang, mean = flift_j(disp, masks)
                out = fpr(vpr, pts_c, has, ang, mean)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
