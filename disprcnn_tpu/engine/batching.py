"""Loader batch -> model kwargs, per meta-architecture.

The reference threads (images, targets) / (images, preds2d, targets) tuples
through the trainer depending on META_ARCHITECTURE
(engine/trainer.py:93-97, modeling/detector/disprcnn3d.py forward signature);
here the dispatch produces one kwargs dict per step so tools/train_net.py and
tools/test_net.py stay model-agnostic.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..structures.stereo import StereoBoxes

# keys the 2D detector trains on
_KEYS_2D = ("left", "right", "gt_left", "gt_right", "gt_labels", "gt_valid", "gt_masks")


def preds_to_stereoboxes(batch: Dict[str, np.ndarray]) -> StereoBoxes:
    """Offline 2D predictions (pred_* keys) -> batched StereoBoxes pytree."""
    return StereoBoxes(
        left=jnp.asarray(batch["pred_left"]),
        right=jnp.asarray(batch["pred_right"]),
        score=jnp.asarray(batch["pred_score"]),
        valid=jnp.asarray(batch["pred_valid"]),
        fields={
            "mask": jnp.asarray(batch["pred_mask"]),
            "labels": jnp.asarray(batch["pred_labels"]),
        },
    )


def make_batch_converter(cfg):
    """-> (convert(batch, train) -> model kwargs, static_apply_kwargs).

    `convert` output feeds model.apply(**kwargs); static_apply_kwargs carry
    the python-static flags (train_psm/train_pc) for make_train_step.
    """
    meta = cfg.MODEL.META_ARCHITECTURE
    if meta in ("DispRCNN", "GeneralizedRCNN"):
        want_disp = bool(cfg.MODEL.DISPNET_ON and cfg.SOLVER.TRAIN_PSM)

        def convert(batch, train: bool):
            kw = {"left": jnp.asarray(batch["left"]),
                  "right": jnp.asarray(batch["right"])}
            if train:
                for k in _KEYS_2D[2:]:
                    if k in batch:
                        kw[k] = jnp.asarray(batch[k])
                if want_disp and "gt_disp" in batch:
                    kw["gt_disp"] = jnp.asarray(batch["gt_disp"])
            return kw

        static = {}
        if cfg.MODEL.DISPNET_ON:
            static["train_psm"] = bool(cfg.SOLVER.TRAIN_PSM)
        return convert, static

    if meta == "DispRCNN3D":
        def convert(batch, train: bool):
            # 3D stage crops RAW images (disprcnn3d.py:44-50); loader provides
            # raw_left when a Normalize transform ran, else left IS raw.
            left = batch.get("raw_left", batch["left"])
            right = batch.get("raw_right", batch["right"])
            kw = {
                "left_img": jnp.asarray(left),
                "right_img": jnp.asarray(right),
                "dets": preds_to_stereoboxes(batch),
                "calib": {k: jnp.asarray(v) for k, v in batch["calib"].items()},
            }
            if train:
                if "gt_disp" in batch:
                    kw["gt_disp"] = jnp.asarray(batch["gt_disp"])
                kw["gt_left"] = jnp.asarray(batch["gt_left"])
                kw["gt_boxes3d"] = jnp.asarray(batch["gt_box3d"])
                kw["gt_valid"] = jnp.asarray(batch["gt_valid"])
            return kw

        static = {
            "train_psm": bool(cfg.SOLVER.TRAIN_PSM),
            "train_pc": bool(cfg.SOLVER.TRAIN_PC),
        }
        return convert, static

    raise NotImplementedError(meta)
