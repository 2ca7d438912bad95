"""Dataset catalog: name -> factory + args (reference config/paths_catalog.py:8-100).

The reference names (kitti_{split}_{vob|pob}_{car|pedestrian} and
kitti_{split}_cyclist) resolve to KittiStereoDataset configurations; a
synthetic_* family is added for data-free testing and benchmarking.
"""
from __future__ import annotations

import re

DATA_DIR = "data/kitti"


def resolve(name: str, cfg=None, training: bool = True, transforms=None):
    from .datasets.kitti import KittiStereoDataset
    from .datasets.synthetic import SyntheticStereoDataset

    max_gt = cfg.TPU.MAX_GT if cfg is not None else 32

    m = re.match(r"kitti_(train|val|trainval|test)_(vob|pob)_(car|pedestrian)$", name)
    if m:
        split, base, category = m.groups()
        return KittiStereoDataset(
            root=DATA_DIR, split=split, category=category, max_gt=max_gt,
            training=training, transforms=transforms, shape_prior_base=base,
        )
    m = re.match(r"kitti_(train|val|trainval|test)_cyclist$", name)
    if m:
        return KittiStereoDataset(
            root=DATA_DIR, split=m.group(1), category="cyclist", max_gt=max_gt,
            training=training, transforms=transforms, shape_prior_base=None,
        )
    m = re.match(r"synthetic_(\d+)$", name)
    if m:
        return SyntheticStereoDataset(
            n_samples=int(m.group(1)), max_gt=max_gt, transforms=transforms
        )
    raise KeyError(f"Unknown dataset: {name}")
