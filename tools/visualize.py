"""Prediction visualizer (replaces the reference's visualize.ipynb).

Renders 2D boxes, instance masks, ROI disparity and projected 3D boxes onto
the left image and writes PNGs.

Usage: python tools/visualize.py --predictions predictions.pkl
       --dataset synthetic_8 --out viz/
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, ".")

import numpy as np

BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def draw_box2d(img, box, color):
    x1, y1, x2, y2 = (int(round(v)) for v in box)
    h, w = img.shape[:2]
    x1, x2 = max(x1, 0), min(x2, w - 1)
    y1, y2 = max(y1, 0), min(y2, h - 1)
    img[y1:y2 + 1, [x1, x2]] = color
    img[[y1, y2], x1:x2 + 1] = color


def draw_line(img, p0, p1, color):
    import cv2

    cv2.line(img, (int(p0[0]), int(p0[1])), (int(p1[0]), int(p1[1])), color.tolist(), 1)


def render(sample, pred, out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from disprcnn_tpu.structures.boxes3d import corners_from_xyzhwl_ry, project_corners_to_img

    img = (sample.get("raw_left", sample["left"]) * 255).clip(0, 255).astype(np.uint8).copy()
    rng = np.random.default_rng(0)
    n = len(pred.get("scores", []))
    for i in range(n):
        if "valid" in pred and not pred["valid"][i]:
            continue
        color = rng.integers(100, 255, 3).astype(np.uint8)
        draw_box2d(img, pred["left_boxes"][i], color)
        if "masks" in pred and np.ndim(pred["masks"]) == 3:
            from disprcnn_tpu.structures.masks import paste_mask_in_image

            m = np.asarray(
                paste_mask_in_image(
                    jnp.asarray(pred["masks"][i]), jnp.asarray(pred["left_boxes"][i]),
                    img.shape[0], img.shape[1],
                )
            )
            img[m] = (0.6 * img[m] + 0.4 * color).astype(np.uint8)
        if "box3d" in pred and "P2" in sample:
            corners = corners_from_xyzhwl_ry(jnp.asarray(pred["box3d"][i])[None])[0]
            _, depth = project_corners_to_img(corners[None], jnp.asarray(sample["P2"]))
            if float(jnp.min(depth)) > 0.1:
                hom = np.concatenate([np.asarray(corners), np.ones((8, 1))], axis=1)
                proj = hom @ np.asarray(sample["P2"]).T
                uvpts = proj[:, :2] / proj[:, 2:3]
                for a, b in BOX_EDGES:
                    draw_line(img, uvpts[a], uvpts[b], color)
    import cv2

    cv2.imwrite(out_path, img[:, :, ::-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--predictions", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=20)
    args = p.parse_args()

    from disprcnn_tpu.config import get_default_cfg
    from disprcnn_tpu.data.catalog import resolve

    with open(args.predictions, "rb") as f:
        predictions = pickle.load(f)
    ds = resolve(args.dataset, get_default_cfg(), training=False, transforms=None)
    os.makedirs(args.out, exist_ok=True)
    by_id = {ds[i]["imgid"]: i for i in range(min(len(ds), args.limit * 4))}
    done = 0
    for imgid, pred in predictions.items():
        if imgid not in by_id or done >= args.limit:
            continue
        render(ds[by_id[imgid]], pred, os.path.join(args.out, f"{imgid}.png"))
        done += 1
    print(f"rendered {done} images to {args.out}")


if __name__ == "__main__":
    main()
