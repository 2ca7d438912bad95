"""Inference/eval entry point (reference tools/test_net.py:19-103).

Usage: python tools/test_net.py --config-file configs/... [--ckpt DIR]
       [--no_force_recompute] [KEY VALUE ...]
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
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from disprcnn_tpu.config import get_default_cfg
    from disprcnn_tpu.data.catalog import resolve
    from disprcnn_tpu.data.loader import StereoBatchLoader
    from disprcnn_tpu.data.transforms import build_transforms
    from disprcnn_tpu.engine.inference import inference
    from disprcnn_tpu.evaluation.kitti_eval import write_kitti_txt
    from disprcnn_tpu.models.build import build_detection_model
    from disprcnn_tpu.utils.checkpoint import Checkpointer
    from disprcnn_tpu.utils.logging import setup_logger

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    logger = setup_logger("disprcnn_tpu.test", cfg.OUTPUT_DIR)

    hw = tuple(int(v) for v in args.static_hw.split(","))
    names = list(cfg.DATASETS.TEST) or [args.dataset or "synthetic_16"]
    if args.dataset:
        names = [args.dataset]
    transforms = build_transforms(cfg, is_train=False)

    model = build_detection_model(cfg)
    rng = jax.random.PRNGKey(0)

    for name in names:
        ds = resolve(name, cfg, training=False, transforms=transforms)
        loader = StereoBatchLoader(
            ds, max(cfg.TEST.IMS_PER_BATCH, 1), hw, shuffle=False,
            size_divisibility=max(cfg.DATALOADER.SIZE_DIVISIBILITY, 32),
        )
        sample = next(iter(loader))
        init_left = jnp.asarray(sample["left"][:1])
        variables = model.init(
            {"params": rng, "sampling": rng}, init_left, init_left, train=False
        )
        if args.ckpt:
            ckpt = Checkpointer(args.ckpt)
            from disprcnn_tpu.engine.trainer import TrainState

            # restore params-only view
            state, _ = ckpt.load(
                type("S", (), {})() if False else _state_template(variables), None, True
            )
            variables = {
                "params": state.params, "frozen": state.frozen,
                **({"batch_stats": state.batch_stats} if state.batch_stats else {}),
            }

        apply = jax.jit(lambda vv, l, r: model.apply(vv, l, r, train=False))

        def predict(batch):
            out = apply(variables, jnp.asarray(batch["left"]), jnp.asarray(batch["right"]))
            dets = out["detections"]
            return {
                "left_boxes": np.asarray(dets.left),
                "right_boxes": np.asarray(dets.right),
                "scores": np.asarray(dets.score),
                "valid": np.asarray(dets.valid),
                "labels": np.asarray(dets.fields["labels"]),
                "masks": np.asarray(out.get("masks", np.zeros(1))),
            }

        out_dir = os.path.join(cfg.OUTPUT_DIR, "inference", name)
        preds = inference(
            predict, loader, name, out_dir,
            force_recompute=not args.no_force_recompute, logger=logger,
        )
        txt_dir = write_kitti_txt(preds, out_dir)
        logger.info(f"wrote KITTI txt to {txt_dir}")


def _state_template(variables):
    import jax.numpy as jnp

    from disprcnn_tpu.engine.trainer import TrainState

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state={},
        uncert=None,
    )


if __name__ == "__main__":
    main()
