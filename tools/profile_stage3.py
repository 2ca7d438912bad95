"""Sub-stage timing of the PointRCNN 3D stage and the 2D detector on-chip.

Splits the 29 ms `pointrcnn` block of tools/profile_pipeline.py into
RPN3D (pointnet2 MSG), proposal NMS, roipool3d, RCNNNet, postprocess, and
the 21 ms `2d_detector` block into backbone / RPN / ROI heads.

Usage: python tools/profile_stage3.py
"""
from __future__ import annotations

import sys

import numpy as np


def log(msg):
    print(msg, flush=True)

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--pre-nms", type=int, default=128,
                    help="3D RPN pre-NMS budget (reference recipe: 768)")
    ap.add_argument("--post-nms", type=int, default=16,
                    help="3D RPN post-NMS proposals/ROI (reference: 100)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from disprcnn_tpu.models.pointrcnn import bbox3d_codec as codec, lift, rcnn3d, rpn3d
    from disprcnn_tpu.models.pointrcnn.point_rcnn import PointRCNN, _decanon_rois
    from disprcnn_tpu.utils.benchmarking import device_timeit

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    r, n = 16, 768
    rng = jax.random.PRNGKey(0)
    prcnn = PointRCNN(npoints=n, rcnn_enabled=True, dtype=jnp.bfloat16)

    import os
    import pickle

    pts0 = jax.random.normal(rng, (r, n, 3)) * 2.0 + jnp.asarray([0, 0, 20.0])
    ok = jnp.ones((r,), bool)
    ang = jnp.zeros((r,))
    mean = jnp.zeros((r, 3))
    cache = "/root/repo/.cache/profile_vpr.pkl"
    if os.path.exists(cache):
        log("loading cached variables...")
        v = pickle.load(open(cache, "rb"))
    else:
        log("synthesizing variables from eval_shape...")
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

    log("device_put...")
    v, pts = jax.device_put((v, pts0), dev)
    ok, ang, mean = jax.device_put((ok, ang, mean), dev)
    anchor = jnp.asarray(prcnn.mean_size, jnp.bfloat16)

    rpn = rpn3d.RPN3D(
        codec_cfg=prcnn.rpn_codec, use_bn=True, npoints=prcnn.sa_npoints,
        dtype=jnp.bfloat16, name="rpn",
    )
    vr = {col: sub["rpn"] for col, sub in v.items() if "rpn" in sub}

    t = {}
    frpn = jax.jit(lambda v, p: rpn.apply(v, p, train=False)["cls"])
    log("timing rpn3d...")
    t["rpn3d_pointnet"] = device_timeit(frpn, vr, pts)

    frpn_full = jax.jit(lambda v, p: rpn.apply(v, p, train=False))
    rpn_out = frpn_full(vr, pts)

    def fprop(cls, reg, xyz):
        return rpn3d.propose(
            cls, reg, xyz, anchor, prcnn.rpn_codec,
            pre_nms_top_n=args.pre_nms, post_nms_top_n=args.post_nms,
            nms_thresh=0.8, rotated=False,
        )

    fprop_j = jax.jit(fprop)
    log("timing propose...")
    t["propose_nms"] = device_timeit(
        fprop_j, rpn_out["cls"], rpn_out["reg"], rpn_out["xyz"])
    rois_c, roi_scores, prop_valid = fprop_j(
        rpn_out["cls"], rpn_out["reg"], rpn_out["xyz"])

    rois = _decanon_rois(rois_c, ang, mean)
    xyz_rect = lift.decanonicalize(rpn_out["xyz"], ang, mean)
    seg = (jax.nn.sigmoid(rpn_out["cls"]) > 0.3).astype(jnp.bfloat16)

    fpool = jax.jit(lambda x, f, s, ro: rcnn3d.pool_rcnn_inputs(
        x, f, s, ro, num_points=prcnn.rcnn_num_points))
    log("timing pool...")
    t["roipool3d"] = device_timeit(fpool, xyz_rect, rpn_out["features"], seg, rois)
    pts_input, empty = fpool(xyz_rect, rpn_out["features"], seg, rois)

    rc = rcnn3d.RCNNNet(dtype=jnp.bfloat16, name="rcnn")
    vc = {col: sub["rcnn"] for col, sub in v.items() if "rcnn" in sub}
    k = rois.shape[1]
    flat = pts_input.reshape(r * k, prcnn.rcnn_num_points, -1)
    frc = jax.jit(lambda v, p: rc.apply(v, p, train=False))
    log("timing rcnn...")
    t["rcnn_net"] = device_timeit(frc, vc, flat)
    cls_pred, reg_pred = frc(vc, flat)

    fpost = jax.jit(lambda c, g, ro, pv, rs: rcnn3d.rcnn_postprocess(
        c.reshape(r, k), g.reshape(r, k, -1), ro, pv, rs,
        jnp.asarray(prcnn.mean_size, jnp.float32)))
    t["rcnn_postproc"] = device_timeit(
        fpost, cls_pred, reg_pred, rois, prop_valid & ~empty, roi_scores)

    from disprcnn_tpu.utils.benchmarking import compiled_flops, peak_flops

    fl = {}
    fl["rpn3d_pointnet"] = compiled_flops(
        lambda v, p: rpn.apply(v, p, train=False)["cls"], vr, pts)
    fl["propose_nms"] = compiled_flops(
        fprop, rpn_out["cls"], rpn_out["reg"], rpn_out["xyz"])
    fl["roipool3d"] = compiled_flops(
        lambda x, f, s, ro: rcnn3d.pool_rcnn_inputs(
            x, f, s, ro, num_points=prcnn.rcnn_num_points),
        xyz_rect, rpn_out["features"], seg, rois)
    fl["rcnn_net"] = compiled_flops(lambda v, p: rc.apply(v, p, train=False), vc, flat)

    total = sum(t.values())
    peak = peak_flops()
    for kk, vv in t.items():
        g = fl.get(kk, 0.0)
        mfu = g / (vv * 1e-3) / peak * 100 if peak and vv else 0.0
        print(f"{kk:>16}: {vv:8.2f} ms  ({vv / total * 100:4.1f}%)  "
              f"{g / 1e9:8.1f} GFLOP  MFU {mfu:5.1f}%")
    print(f"{'stage3 total':>16}: {total:8.2f} ms")

    # ---- 2D detector split ----
    from disprcnn_tpu.models.detector.disprcnn import DispRCNN

    h, w = 384, 1248
    model2d = DispRCNN(
        body="R-101", pre_nms_top_n_test=6000, post_nms_top_n_test=300,
        max_det=16, detections_per_img=16, dtype=jnp.bfloat16,
    )
    with jax.default_device(cpu):
        left0 = jnp.zeros((1, h, w, 3), jnp.float32)
        v2d = jax.jit(
            lambda kk, a: model2d.init({"params": kk, "sampling": kk}, a, a, train=False)
        )(rng, left0)
    v2d = jax.device_put(v2d, dev)
    img = jax.device_put(
        jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, h, w, 3)), jnp.float32), dev)

    t2 = {}
    from disprcnn_tpu.models.backbone.fpn import ResNetFPNBackbone

    bb = ResNetFPNBackbone(
        body="R-101", out_channels=model2d.out_channels,
        freeze_at=model2d.freeze_at, dtype=jnp.bfloat16,
    )
    vbb = {col: sub["backbone"] for col, sub in v2d.items() if "backbone" in sub}
    fbb = jax.jit(lambda v, a: bb.apply(v, jnp.concatenate([a, a])))
    log("timing backbone...")
    t2["backbone_2x"] = device_timeit(fbb, vbb, img)
    f2d = jax.jit(lambda v, l, r: model2d.apply(v, l, r, train=False)["detections"].left)
    t2["full_2d"] = device_timeit(f2d, v2d, img, img)
    t2["rpn+heads (derived)"] = t2["full_2d"] - t2["backbone_2x"]
    for kk, vv in t2.items():
        print(f"{kk:>20}: {vv:8.2f} ms")


if __name__ == "__main__":
    main()
