"""Sub-module timing of the 2D stereo detector on-chip.

Splits the ~21 ms DispRCNN eval forward into backbone / SRPN head /
SRPN postprocess (decode + double-view NMS) / box head (pool+MLP) /
box postprocess (per-class NMS) / mask head.

Usage: python tools/profile_2d.py
"""
from __future__ import annotations

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

    from disprcnn_tpu.models.backbone.fpn import ResNetFPNBackbone
    from disprcnn_tpu.models.detector.disprcnn import DispRCNN
    from disprcnn_tpu.models.roi_heads import box_head as bh
    from disprcnn_tpu.models.roi_heads import mask_head as mh
    from disprcnn_tpu.models.rpn import stereo_rpn
    from disprcnn_tpu.models.rpn.anchors import AnchorGenerator
    from disprcnn_tpu.structures.stereo import StereoBoxes
    from disprcnn_tpu.utils.benchmarking import device_timeit

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    h, w = 384, 1248
    rng = jax.random.PRNGKey(0)
    model2d = DispRCNN(
        body="R-101", pre_nms_top_n_test=6000, post_nms_top_n_test=300,
        max_det=16, detections_per_img=16, dtype=jnp.bfloat16,
    )
    import os
    import pickle

    cache = "/root/repo/.cache/profile_v2d.pkl"
    if os.path.exists(cache):
        log("loading cached variables...")
        with open(cache, "rb") as f:
            v2d = pickle.load(f)
        v2d = jax.tree.map(jnp.asarray, v2d)
    else:
        # For timing, weight VALUES are irrelevant — only shapes/dtypes.
        # eval_shape + numpy fill avoids the (pathologically slow here)
        # CPU-jit init of the 60M-param model.
        log("synthesizing variables from eval_shape...")
        left0 = jnp.zeros((1, h, w, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda kk, a: model2d.init({"params": kk, "sampling": kk}, a, a, train=False),
            rng, left0,
        )
        nprng = np.random.default_rng(0)

        def fill(path, s):
            a = (0.05 * nprng.standard_normal(s.shape)).astype(s.dtype)
            if any("var" in str(getattr(p, "key", "")) for p in path):
                a = np.abs(a) + np.asarray(0.9, s.dtype)  # rsqrt(var) sane
            return a

        v2d = jax.tree_util.tree_map_with_path(fill, shapes)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump(v2d, f)
    v2d = jax.device_put(v2d, dev)
    img = jax.device_put(
        jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, h, w, 3)), jnp.float32),
        dev)

    sub = lambda name: {col: s[name] for col, s in v2d.items() if name in s}
    t = {}

    bb = ResNetFPNBackbone(body="R-101", out_channels=model2d.out_channels,
                           freeze_at=model2d.freeze_at, dtype=jnp.bfloat16)
    fbb = jax.jit(lambda v, a: bb.apply(v, jnp.concatenate([a, a])))
    log("timing backbone...")
    t["backbone_2x"] = device_timeit(fbb, sub("backbone"), img)
    feats = fbb(sub("backbone"), img)
    lf = [f[:1] for f in feats]
    rf = [f[1:] for f in feats]

    gen = AnchorGenerator(model2d.anchor_sizes, model2d.anchor_strides,
                          model2d.aspect_ratios, model2d.straddle_thresh)
    anchors_np, _ = gen((h, w), [f.shape[1:3] for f in feats])
    anchors = jax.device_put(jnp.asarray(anchors_np), dev)

    head = stereo_rpn.SRPNHead(in_channels=model2d.out_channels,
                               num_anchors=gen.num_anchors_per_location,
                               dtype=jnp.bfloat16)
    # real pipeline path: shared conv on the concat-batch (2B) backbone
    # outputs (disprcnn.py passes both_feats; the split-view form picks a
    # degenerate B=1 conv layout, ~2x slower — SRPNHead docstring)
    fhead = jax.jit(lambda v, f: stereo_rpn.flatten_levels(
        head.apply(v, None, None, both_feats=f)))
    log("timing srpn head...")
    t["srpn_head"] = device_timeit(fhead, sub("rpn_head"), feats)
    obj_logits, deltas = fhead(sub("rpn_head"), feats)

    fpost = jax.jit(lambda o, d: stereo_rpn.postprocess_batched(
        anchors, o, d, (h, w), 6000, 300,
        model2d.rpn_nms_thresh, model2d.rpn_min_size))
    log("timing srpn postprocess...")
    t["srpn_postproc"] = device_timeit(fpost, obj_logits, deltas)
    proposals = fpost(obj_logits, deltas)

    p = proposals.left.shape[1]
    flat = lambda x: x.reshape((p,) + x.shape[2:])
    batch_idx = jnp.zeros((p,), jnp.int32)
    rois_flat = StereoBoxes(left=flat(proposals.left), right=flat(proposals.right),
                            score=flat(proposals.score), valid=flat(proposals.valid))
    extractor = bh.StereoBoxFeatureExtractor(
        mlp_dim=model2d.mlp_head_dim, resolution=model2d.box_resolution,
        scales=model2d.pooler_scales, sampling_ratio=model2d.box_sampling_ratio,
        dtype=jnp.bfloat16)
    predictor = bh.StereoBoxPredictor(num_classes=model2d.num_classes,
                                      dtype=jnp.bfloat16)

    def fbox(ve, vp, lf, rf, rois_flat):
        x = extractor.apply(ve, lf[:-1], rf[:-1], rois_flat, batch_idx, train=False)
        return predictor.apply(vp, x)

    fbox_j = jax.jit(fbox)
    log("timing box head...")
    t["box_head(pool+mlp)"] = device_timeit(
        fbox_j, sub("box_extractor"), sub("box_predictor"), lf, rf, rois_flat)
    class_logits, box_deltas = fbox_j(
        sub("box_extractor"), sub("box_predictor"), lf, rf, rois_flat)

    fbpost = jax.jit(lambda cl, bd, pr: bh.postprocess_batched(
        cl.reshape(1, p, -1), bd.reshape(1, p, -1), pr, (h, w),
        model2d.score_thresh, model2d.box_nms_thresh,
        model2d.detections_per_img, model2d.max_det))
    log("timing box postprocess...")
    t["box_postproc"] = device_timeit(fbpost, class_logits, box_deltas, proposals)
    dets = fbpost(class_logits, box_deltas, proposals)

    d = model2d.max_det
    det_flat_left = dets.left.reshape(d, 4)
    det_bi = jnp.zeros((d,), jnp.int32)
    mask = mh.MaskHead(num_classes=model2d.num_classes,
                       resolution=model2d.mask_resolution,
                       scales=model2d.pooler_scales,
                       sampling_ratio=model2d.mask_sampling_ratio,
                       dtype=jnp.bfloat16)
    fmask = jax.jit(lambda v, lf, db: mask.apply(v, lf[:-1], db, det_bi))
    log("timing mask head...")
    t["mask_head"] = device_timeit(fmask, sub("mask_head"), lf, det_flat_left)

    total = sum(t.values())
    for kk, vv in t.items():
        print(f"{kk:>20}: {vv:8.2f} ms  ({vv / total * 100:4.1f}%)")
    print(f"{'2d sum':>20}: {total:8.2f} ms")


if __name__ == "__main__":
    main()
