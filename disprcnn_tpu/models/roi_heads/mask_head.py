"""Mask head on the left view (reference modeling/roi_heads/mask_head/*).

- MaskRCNNFPNFeatureExtractor: 14x14 pooling + four 3x3/256 convs + ReLU
  (roi_mask_feature_extractors.py).
- MaskRCNNC4Predictor: 2x2 stride-2 transposed conv + 1x1 conv to
  num_classes logits at 28x28 (roi_mask_predictors.py).
- Loss (loss.py:44-141): BCE-with-logits on positive ROIs between the
  predicted class channel and the GT mask cropped+resized to the ROI.
- Inference (inference.py:12-60): sigmoid, select the predicted label's
  channel.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...structures.masks import crop_and_resize_mask
from .pooler import fpn_roi_align


class MaskHead(nn.Module):
    num_classes: int = 2
    conv_dims: Tuple[int, ...] = (256, 256, 256, 256)
    resolution: int = 14  # pooler resolution; logits come out at 2x
    scales: Tuple[float, ...] = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, batch_idx):
        x = fpn_roi_align(
            feats, boxes, batch_idx, self.scales, self.resolution, self.sampling_ratio
        )
        for i, dim in enumerate(self.conv_dims):
            x = nn.relu(
                nn.Conv(dim, (3, 3), padding="SAME", dtype=self.dtype, name=f"fcn{i + 1}")(x)
            )
        x = nn.relu(
            nn.ConvTranspose(
                self.conv_dims[-1], (2, 2), strides=(2, 2), dtype=self.dtype,
                name="deconv",
            )(x)
        )
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="mask_logits")(x)


def mask_loss(
    mask_logits: jnp.ndarray,  # (P, 2r, 2r, C)
    boxes: jnp.ndarray,  # (P, 4) positive proposals
    labels: jnp.ndarray,  # (P,) matched class
    pos: jnp.ndarray,  # (P,) positive mask
    gt_masks: jnp.ndarray,  # (M, H, W) full-image GT masks
    matched_gt: jnp.ndarray,  # (P,) gt index per proposal
) -> jnp.ndarray:
    """Mean BCE over all pixels of positive ROIs (loss.py project+BCE)."""
    out_size = mask_logits.shape[1]
    targets = jax.vmap(lambda gi, b: crop_and_resize_mask(gt_masks[gi], b, out_size))(
        matched_gt, boxes
    )
    lbl = jnp.clip(labels, 0).astype(jnp.int32)
    logit = jnp.take_along_axis(
        mask_logits, lbl[:, None, None, None], axis=-1
    )[..., 0]
    t = (targets > 0.5).astype(logit.dtype)
    bce = jnp.maximum(logit, 0) - logit * t + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    w = pos[:, None, None].astype(logit.dtype)
    return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w) * out_size * out_size, 1.0)


def mask_probs(mask_logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(P, 2r, 2r, C), (P,) -> (P, 2r, 2r) sigmoid of the label channel."""
    lbl = jnp.clip(labels, 0).astype(jnp.int32)
    logit = jnp.take_along_axis(mask_logits, lbl[:, None, None, None], axis=-1)[..., 0]
    return jax.nn.sigmoid(logit)
