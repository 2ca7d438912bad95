"""Inference/eval entry point (reference tools/test_net.py:19-103).

Usage: python tools/test_net.py --config-file configs/... [--ckpt DIR]
       [--no_force_recompute] [KEY VALUE ...]

Dispatches on MODEL.META_ARCHITECTURE:
- DispRCNN: 2D stereo detections + masks -> predictions.pkl (the offline-2D
  handoff consumed by stage 2/3 via tools/split_predictions.py).
- DispRCNN3D: full 3-stage pipeline; predictions gain box3d/score3d and the
  KITTI txt carries 3D fields so AP-BEV/AP-3D are computable
  (reference engine/inference.py:215-352 + kitti_eval.py write_txt).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def parse_args():
    p = argparse.ArgumentParser(description="disprcnn_tpu inference")
    p.add_argument("--config-file", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--no_force_recompute", action="store_true")
    p.add_argument("--dataset", default=None)
    p.add_argument("--static-hw", default="384,1248")
    p.add_argument("--evaluate", action="store_true",
                   help="run the KITTI AP evaluator on the written txt")
    p.add_argument("--gt-dir", default=None, help="label dir for --evaluate")
    p.add_argument("--roi-buckets", default=None,
                   help="comma list (e.g. 4,8,16): per-image ROI-count bucket "
                        "dispatch for the 3D stage — one compiled program per "
                        "bucket; real scenes rarely fill TPU.MAX_DETECTIONS, "
                        "so small-bucket images skip most of the iDispNet/"
                        "PointRCNN compute (requires TEST.IMS_PER_BATCH=1)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu for smoke runs)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def load_eval_variables(model, init_kwargs, static_kwargs, ckpt_dir, rng):
    """Init the model then overwrite params from an orbax checkpoint dir."""
    import jax
    import numpy as np

    from disprcnn_tpu.utils.checkpoint import load_stage_weights

    def init_fn(rngs, kw):
        return model.init(rngs, train=False, **static_kwargs, **kw)

    variables = jax.jit(init_fn)({"params": rng, "sampling": rng}, init_kwargs)
    variables = jax.tree.map(np.asarray, variables)
    if ckpt_dir:
        variables = load_stage_weights(variables, ckpt_dir)
    return variables


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from disprcnn_tpu.config import get_default_cfg
    from disprcnn_tpu.data.catalog import resolve
    from disprcnn_tpu.data.loader import StereoBatchLoader
    from disprcnn_tpu.data.transforms import build_transforms
    from disprcnn_tpu.engine.batching import make_batch_converter
    from disprcnn_tpu.engine.inference import inference
    from disprcnn_tpu.evaluation.kitti_eval import evaluate_kitti, write_kitti_txt
    from disprcnn_tpu.models.build import build_detection_model
    from disprcnn_tpu.utils.logging import setup_logger

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    logger = setup_logger("disprcnn_tpu.test", cfg.OUTPUT_DIR)

    hw = tuple(int(v) for v in args.static_hw.split(","))
    names = [args.dataset] if args.dataset else (
        list(cfg.DATASETS.TEST) or ["synthetic_16"]
    )

    transforms = build_transforms(cfg, is_train=False)
    model = build_detection_model(cfg)
    convert, static_kwargs = make_batch_converter(cfg)
    meta = cfg.MODEL.META_ARCHITECTURE
    rng = jax.random.PRNGKey(0)
    ckpt_dir = args.ckpt or (
        f"{cfg.OUTPUT_DIR}/ckpt"
        if os.path.exists(f"{cfg.OUTPUT_DIR}/ckpt/last_checkpoint") else None
    )

    for name in names:
        ds = resolve(name, cfg, training=False, transforms=transforms)
        loader = StereoBatchLoader(
            ds, max(cfg.TEST.IMS_PER_BATCH, 1), hw, shuffle=False,
            size_divisibility=max(cfg.DATALOADER.SIZE_DIVISIBILITY, 32),
            num_shards=jax.process_count(), shard_id=jax.process_index(),
            pad_last=True,
        )
        sample = next(iter(loader))
        init_kwargs = convert(sample, train=False)
        variables = load_eval_variables(model, init_kwargs, static_kwargs, ckpt_dir, rng)

        apply = jax.jit(
            lambda vv, kw: model.apply(
                vv, train=False, rngs={"sampling": rng}, **static_kwargs, **kw
            )
        )

        if meta in ("DispRCNN", "GeneralizedRCNN"):
            def predict(batch):
                out = apply(variables, convert(batch, train=False))
                dets = out["detections"]
                pred = {
                    "left_boxes": np.asarray(dets.left),
                    "right_boxes": np.asarray(dets.right),
                    "scores": np.asarray(dets.score),
                    "valid": np.asarray(dets.valid),
                    "labels": np.asarray(dets.fields["labels"]),
                }
                if "masks" in out:
                    pred["masks"] = np.asarray(out["masks"])
                return pred
        else:  # DispRCNN3D: full pipeline, keep the 2D boxes + 3D outputs
            buckets = (sorted({int(x) for x in args.roi_buckets.split(",")})
                       if args.roi_buckets else None)

            def slice_dets(kw, k):
                from disprcnn_tpu.structures.stereo import StereoBoxes

                dd = kw["dets"]
                kw = dict(kw)
                kw["dets"] = StereoBoxes(
                    left=dd.left[:, :k], right=dd.right[:, :k],
                    score=dd.score[:, :k], valid=dd.valid[:, :k],
                    fields={f: v[:, :k] for f, v in dd.fields.items()},
                )
                return kw

            def predict(batch):
                kw = convert(batch, train=False)
                dfull = kw["dets"].left.shape[1]
                k = dfull
                if buckets and kw["dets"].left.shape[0] == 1:
                    # detections are score-ordered with valid entries first
                    # (bh.postprocess top_k), so the [:k] slice is lossless
                    # whenever k >= #valid
                    nv = int(np.asarray(kw["dets"].valid).sum())
                    k = min(next((b for b in buckets if b >= nv), dfull), dfull)
                    kw = slice_dets(kw, k)
                out = apply(variables, kw)
                if k != dfull:
                    # pad the (B, D, ...) outputs back to the full ROI budget
                    # (tail slots were invalid anyway)
                    pad = dfull - k
                    out = dict(out)
                    for key in ("box3d", "score3d", "random", "roi_ok"):
                        if key in out:
                            a = np.asarray(out[key])
                            pw = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
                            out[key] = np.pad(a, pw)
                valid = batch["pred_valid"]
                if "roi_ok" in out:
                    valid = valid & np.asarray(out["roi_ok"])
                pred = {
                    "left_boxes": batch["pred_left"],
                    "right_boxes": batch["pred_right"],
                    "scores": batch["pred_score"],
                    "labels": batch["pred_labels"],
                    "masks": batch["pred_mask"],  # stage handoff keeps masks
                    "valid": valid,
                }
                if "box3d" in out:
                    pred["box3d"] = np.asarray(out["box3d"], np.float32)
                    pred["score3d"] = np.asarray(out["score3d"], np.float32)
                    pred["random3d"] = np.asarray(out.get("random", np.zeros(1)))
                return pred

        out_dir = os.path.join(cfg.OUTPUT_DIR, "inference", name)
        preds = inference(
            predict, loader, name, out_dir,
            force_recompute=not args.no_force_recompute, logger=logger,
        )
        txt_dir = write_kitti_txt(preds, out_dir)
        logger.info(f"wrote KITTI txt to {txt_dir}")
        if args.evaluate and args.gt_dir:
            results = evaluate_kitti(args.gt_dir, txt_dir, out_dir)
            for thr, res in results.items():
                logger.info(f"AP@{thr}: {res}")


if __name__ == "__main__":
    main()
