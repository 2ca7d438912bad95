"""Padded, fixed-shape 2D detection containers (pytree replacement of BoxList).

The reference's BoxList (structures/bounding_box.py:10-455) is a dynamic-length
tensor + dict-of-fields object. On TPU every shape must be static, so the
equivalent is `Boxes2D`: a registered dataclass pytree with a fixed capacity N,
a validity mask, and arbitrary extra fields that transform together with the
boxes under resize/crop/flip. All ops are functional.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Boxes2D:
    """xyxy boxes with validity mask + arbitrary per-box fields.

    xyxy: (N, 4) float; valid: (N,) bool; size: static (width, height);
    fields: dict of (N, ...) arrays (scores, labels, masks, disparity crops...).
    """

    xyxy: jnp.ndarray
    valid: jnp.ndarray
    size: Tuple[int, int] = flax.struct.field(pytree_node=False)
    fields: Dict[str, Any] = flax.struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.xyxy.shape[0]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid)

    # -- field protocol ----------------------------------------------------
    def with_field(self, name: str, value: jnp.ndarray) -> "Boxes2D":
        return self.replace(fields={**self.fields, name: value})

    def get_field(self, name: str) -> jnp.ndarray:
        return self.fields[name]

    def has_field(self, name: str) -> bool:
        return name in self.fields

    # -- geometry ----------------------------------------------------------
    def area(self, to_remove: float = 1.0) -> jnp.ndarray:
        """Reference +1 convention (bounding_box.py area with TO_REMOVE=1)."""
        wh = jnp.maximum(self.xyxy[:, 2:] - self.xyxy[:, :2] + to_remove, 0.0)
        return wh[:, 0] * wh[:, 1]

    def resize(self, new_size: Tuple[int, int]) -> "Boxes2D":
        """Scale boxes to a new (width, height) (bounding_box.py resize)."""
        rw = new_size[0] / self.size[0]
        rh = new_size[1] / self.size[1]
        scale = jnp.asarray([rw, rh, rw, rh], self.xyxy.dtype)
        return self.replace(xyxy=self.xyxy * scale, size=tuple(new_size))

    def clip_to_image(self, to_remove: float = 1.0) -> "Boxes2D":
        w, h = self.size
        x1 = jnp.clip(self.xyxy[:, 0], 0, w - to_remove)
        y1 = jnp.clip(self.xyxy[:, 1], 0, h - to_remove)
        x2 = jnp.clip(self.xyxy[:, 2], 0, w - to_remove)
        y2 = jnp.clip(self.xyxy[:, 3], 0, h - to_remove)
        return self.replace(xyxy=jnp.stack([x1, y1, x2, y2], axis=-1))

    def hflip(self) -> "Boxes2D":
        """Horizontal flip (bounding_box.py transpose FLIP_LEFT_RIGHT,
        including its -TO_REMOVE pixel convention)."""
        w = self.size[0]
        x1 = w - self.xyxy[:, 2] - 1.0
        x2 = w - self.xyxy[:, 0] - 1.0
        return self.replace(
            xyxy=jnp.stack([x1, self.xyxy[:, 1], x2, self.xyxy[:, 3]], axis=-1)
        )

    def remove_small(self, min_size: float) -> "Boxes2D":
        """Invalidate boxes smaller than min_size (boxlist_ops.remove_small_boxes)."""
        wh = self.xyxy[:, 2:] - self.xyxy[:, :2]
        keep = (wh[:, 0] >= min_size) & (wh[:, 1] >= min_size)
        return self.replace(valid=self.valid & keep)

    def mask_invalid(self) -> "Boxes2D":
        """Zero out boxes where invalid (keeps padding numerically benign)."""
        return self.replace(xyxy=jnp.where(self.valid[:, None], self.xyxy, 0.0))

    def take(self, idx: jnp.ndarray, idx_valid: jnp.ndarray) -> "Boxes2D":
        """Gather a fixed-size subset (e.g. post-NMS top-k)."""
        import jax

        fields = jax.tree.map(lambda f: f[idx], self.fields)
        return Boxes2D(
            xyxy=self.xyxy[idx],
            valid=self.valid[idx] & idx_valid,
            size=self.size,
            fields=fields,
        )


def pad_boxes(
    xyxy: jnp.ndarray, capacity: int, size: Tuple[int, int], **fields
) -> Boxes2D:
    """Build a Boxes2D from a (n, 4) array, padding to `capacity`."""
    n = xyxy.shape[0]
    assert n <= capacity, f"{n} boxes exceed capacity {capacity}"
    pad = capacity - n
    out_fields = {}
    for k, v in fields.items():
        out_fields[k] = jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
        )
    return Boxes2D(
        xyxy=jnp.concatenate([xyxy, jnp.zeros((pad, 4), xyxy.dtype)], axis=0),
        valid=jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)]),
        size=tuple(size),
        fields=out_fields,
    )


def union_box(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """Per-row union of two (N,4) xyxy sets
    (reference utils/stereo_utils.py expand_left_right_box)."""
    return jnp.concatenate(
        [jnp.minimum(left[:, :2], right[:, :2]), jnp.maximum(left[:, 2:], right[:, 2:])],
        axis=-1,
    )
