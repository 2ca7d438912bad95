"""Offline ROI dataset generator for standalone iDispNet training.

Reference: tools/kitti_object/generate_psmnet_input_inf.py:29-128 — for each
image, align predicted L/R boxes to a common integer width, crop both RAW
images to 224^2, build the ROI GT disparity (shifted by x1 - x1', value-
rescaled) and the ROI mask, and dump one record per ROI.

Usage: python tools/generate_psmnet_input.py --predictions predictions.pkl
       --dataset kitti_train_vob_car --out data/psmnet_roi/train
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--predictions", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--roi-size", type=int, default=224)
    p.add_argument("--min-score", type=float, default=0.05)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from disprcnn_tpu.config import get_default_cfg
    from disprcnn_tpu.data.catalog import resolve
    from disprcnn_tpu.models.detector.disprcnn3d import (
        warp_gt_disparity_to_roi,
        width_aligned_crop_boxes,
    )
    from disprcnn_tpu.models.detector.disprcnn3d import _mask_on_crop
    from disprcnn_tpu.ops.roi_align import roi_align_batched

    with open(args.predictions, "rb") as f:
        predictions = pickle.load(f)

    cfg = get_default_cfg()
    ds = resolve(args.dataset, cfg, training=False, transforms=None)
    os.makedirs(args.out, exist_ok=True)
    s = args.roi_size
    count = 0
    for idx in range(len(ds)):
        sample = ds[idx]
        imgid = sample["imgid"]
        if imgid not in predictions:
            continue
        pred = predictions[imgid]
        keep = (pred["scores"] > args.min_score) & pred.get(
            "valid", np.ones_like(pred["scores"], bool)
        )
        if not keep.any():
            continue
        lb = jnp.asarray(pred["left_boxes"][keep], jnp.float32)
        rb = jnp.asarray(pred["right_boxes"][keep], jnp.float32)
        lc, rc = width_aligned_crop_boxes(lb, rb)
        bi = jnp.zeros(len(lc), jnp.int32)
        left = jnp.asarray(sample["left"])[None]
        right = jnp.asarray(sample["right"])[None]
        # RAW crops: KittiRoiDataset ImageNet-normalizes at load time
        # (reference stores raw ROI images; crop_and_normalize would be
        # double normalization through the load path)
        lcrops = roi_align_batched(left, lc, bi, s, 1.0, sampling_ratio=1)
        rcrops = roi_align_batched(right, rc, bi, s, 1.0, sampling_ratio=1)
        gt_disp = jnp.asarray(sample["gt_disp"])
        for i in range(len(lc)):
            tgt = warp_gt_disparity_to_roi(gt_disp, lc[i], rc[i], s)
            masks = jnp.asarray(pred["masks"][keep][i])[None]
            m = _mask_on_crop(masks, lb[i : i + 1], lc[i : i + 1], s, 0.5)[0]
            np.savez_compressed(
                os.path.join(args.out, f"{imgid}_{i:03d}.npz"),
                left=np.asarray(lcrops[i]),
                right=np.asarray(rcrops[i]),
                disparity=np.asarray(tgt),
                mask=np.asarray(m, np.float32),
            )
            count += 1
    print(f"wrote {count} ROI records to {args.out}")


if __name__ == "__main__":
    main()
