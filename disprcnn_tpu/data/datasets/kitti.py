"""KITTI stereo object dataset -> fixed-shape numpy samples.

Reference: data/datasets/kitti_car.py:20-337 (and the pedestrian/cyclist
variants, kitti_human.py / kitti_cyclist.py — same loader parameterized by
class filter). Each sample carries:
- left/right images (HWC float32, [0,1] RGB),
- padded GT: left/right 2D boxes aligned across views
  (utils/stereo_utils.align_left_right_targets y-overlap matching), labels,
  3D boxes (xyzhwl_ry, rect frame), validity mask,
- full-image GT disparity (16-bit PNG / 256) and instance masks when the
  shape-prior pseudo-GT is available (VOB/POB dumps),
- calibration scalars.

The zarr mask store of the reference is read through a minimal local reader
(zarr is not installed here); missing aux data degrades to zeros + flags.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..kitti_io import KittiCalib, KittiObject, load_labels, load_split

CLASS_FILTERS = {
    "car": ("Car", "Van"),
    "pedestrian": ("Pedestrian",),
    "cyclist": ("Cyclist",),
}
LABEL_IDS = {"car": 1, "pedestrian": 1, "cyclist": 1}  # binary: fg class is 1


def _boxes_y_overlap(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) vertical-interval IoU used to pair left/right objects
    (stereo_utils.align_left_right_targets)."""
    top = np.maximum(a[:, None, 1], b[None, :, 1])
    bot = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(bot - top, 0, None)
    ua = a[:, 3] - a[:, 1]
    ub = b[:, 3] - b[:, 1]
    return inter / np.maximum(ua[:, None] + ub[None, :] - inter, 1e-6)


def align_left_right(
    left: List[KittiObject], right: List[KittiObject]
) -> List[tuple]:
    """Greedy y-overlap pairing of left/right label objects."""
    if not left or not right:
        return []
    la = np.stack([o.box2d for o in left])
    ra = np.stack([o.box2d for o in right])
    ov = _boxes_y_overlap(la, ra)
    pairs = []
    used = set()
    for i in range(len(left)):
        j = int(np.argmax(ov[i]))
        if ov[i, j] > 0.5 and j not in used:
            used.add(j)
            pairs.append((left[i], right[j]))
    return pairs


class KittiStereoDataset:
    """Index-based dataset; __getitem__ returns a dict of numpy arrays."""

    def __init__(
        self,
        root: str,
        split: str,  # e.g. "train", "val"
        category: str = "car",
        max_gt: int = 32,
        mask_size: int = 28,
        training: bool = True,
        transforms=None,
        shape_prior_base: Optional[str] = None,  # "vob"/"pob" pseudo-GT dir
        offline_2d_predictions: Optional[str] = None,
        filter_empty: bool = True,
    ):
        self.root = root
        self.split_dir = "training" if split in ("train", "val", "trainval") else "testing"
        self.category = category
        self.classes = CLASS_FILTERS[category]
        self.max_gt = max_gt
        self.mask_size = mask_size
        self.training = training
        self.transforms = transforms
        self.shape_prior_base = shape_prior_base
        self.offline_2d = offline_2d_predictions
        ids = load_split(root, f"{split}_set" if not split.endswith("_set") else split)
        if filter_empty and training:
            ids = [i for i in ids if self._annotations(i)]
        self.ids = ids

    def __len__(self):
        return len(self.ids)

    # -- raw pieces --------------------------------------------------------
    def _path(self, sub: str, imgid: str, ext: str) -> str:
        return os.path.join(self.root, "object", self.split_dir, sub, f"{imgid}{ext}")

    def _annotations(self, imgid: str):
        left = [
            o
            for o in load_labels(self._path("label_2", imgid, ".txt"))
            if o.cls_name in self.classes
        ]
        right = [
            o
            for o in load_labels(self._path("label_3", imgid, ".txt"))
            if o.cls_name in self.classes
        ]
        return align_left_right(left, right)

    def _load_image(self, sub: str, imgid: str) -> np.ndarray:
        from PIL import Image

        im = Image.open(self._path(sub, imgid, ".png")).convert("RGB")
        return np.asarray(im, np.float32) / 255.0

    def _load_disparity(self, imgid: str, shape) -> np.ndarray:
        path = self._path(f"disparity_{self.shape_prior_base}", imgid, ".png")
        if self.shape_prior_base and os.path.exists(path):
            from PIL import Image

            arr = np.asarray(Image.open(path), np.float32)
            return arr / 256.0
        return np.zeros(shape, np.float32)

    def _load_masks(self, imgid: str, n: int, shape) -> np.ndarray:
        """Instance masks from the pseudo-GT dump (pickle fallback for zarr)."""
        path = self._path(f"mask_2_{self.shape_prior_base}", imgid, ".pkl")
        if self.shape_prior_base and os.path.exists(path):
            with open(path, "rb") as f:
                m = pickle.load(f)
            return np.asarray(m, np.float32)
        return np.zeros((n,) + tuple(shape), np.float32)

    # -- sample assembly ---------------------------------------------------
    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        imgid = self.ids[idx]
        left_img = self._load_image("image_2", imgid)
        right_img = self._load_image("image_3", imgid)
        calib = KittiCalib.from_file(self._path("calib", imgid, ".txt"))
        pairs = self._annotations(imgid)[: self.max_gt]
        n = len(pairs)
        h, w = left_img.shape[:2]

        gt_left = np.zeros((self.max_gt, 4), np.float32)
        gt_right = np.zeros((self.max_gt, 4), np.float32)
        gt_box3d = np.zeros((self.max_gt, 7), np.float32)
        labels = np.zeros((self.max_gt,), np.int32)
        valid = np.zeros((self.max_gt,), bool)
        for i, (lo, ro) in enumerate(pairs):
            gt_left[i] = lo.box2d
            gt_right[i] = ro.box2d
            gt_box3d[i] = lo.box3d_xyzhwl_ry
            labels[i] = LABEL_IDS[self.category]
            valid[i] = True

        masks = self._load_masks(imgid, n, (h, w))
        full_masks = np.zeros((self.max_gt, h, w), np.float32)
        full_masks[: min(n, len(masks))] = masks[: min(n, len(masks))]

        sample = {
            "imgid": imgid,
            "left": left_img,
            "right": right_img,
            "gt_left": gt_left,
            "gt_right": gt_right,
            "gt_box3d": gt_box3d,
            "gt_labels": labels,
            "gt_valid": valid,
            "gt_masks": full_masks,
            "gt_disp": self._load_disparity(imgid, (h, w)),
            "calib": {
                "fu": np.float32(calib.fu),
                "fv": np.float32(calib.fv),
                "cu": np.float32(calib.cu),
                "cv": np.float32(calib.cv),
                "tx": np.float32(calib.tx),
                "ty": np.float32(calib.ty),
                "fuxb": np.float32(calib.stereo_fuxbaseline),
            },
            "P2": calib.P2.astype(np.float32),
            "P3": calib.P3.astype(np.float32),
        }
        if self.transforms is not None:
            sample = self.transforms(sample)
        return sample
