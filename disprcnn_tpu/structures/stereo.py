"""Stereo detection pytrees: paired left/right boxes with one score/validity.

The reference passes parallel left/right BoxLists through the pipeline; here a
single fixed-capacity pytree carries the pair (the views share y extents by
construction of the 6-param stereo codec).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class StereoBoxes:
    left: jnp.ndarray  # (P, 4) xyxy
    right: jnp.ndarray  # (P, 4) xyxy
    score: jnp.ndarray  # (P,)
    valid: jnp.ndarray  # (P,) bool
    fields: Dict[str, Any] = flax.struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.left.shape[0]

    def with_field(self, name: str, value) -> "StereoBoxes":
        return self.replace(fields={**self.fields, name: value})

    def union(self) -> jnp.ndarray:
        return jnp.concatenate(
            [
                jnp.minimum(self.left[:, :2], self.right[:, :2]),
                jnp.maximum(self.left[:, 2:], self.right[:, 2:]),
            ],
            axis=-1,
        )

    def box6(self) -> jnp.ndarray:
        """(P, 6) joint (x1, y1, x2, y2, x1', x2') with left y."""
        return jnp.concatenate(
            [self.left, self.right[:, 0:1], self.right[:, 2:3]], axis=-1
        )

    def take(self, idx: jnp.ndarray, idx_valid: jnp.ndarray) -> "StereoBoxes":
        import jax

        return StereoBoxes(
            left=self.left[idx],
            right=self.right[idx],
            score=self.score[idx],
            valid=self.valid[idx] & idx_valid,
            fields=jax.tree.map(lambda f: f[idx], self.fields),
        )
