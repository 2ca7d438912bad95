"""Bin-based 3D box codec (PointRCNN style).

Reference: .../lib/utils/bbox_transform.py:24-120 (decode) and
loss_utils.get_reg_loss:100-273 (target construction). A box regression vector
is laid out [x_bins | z_bins | (x_res | z_res if fine) | y_offset | ry_bins |
ry_res | size_res(3)].
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CodecCfg(NamedTuple):
    loc_scope: float = 3.0
    loc_bin_size: float = 0.5
    num_head_bin: int = 12
    xz_fine: bool = False
    ry_fine: bool = False

    @property
    def per_loc_bin_num(self) -> int:
        return int(self.loc_scope / self.loc_bin_size) * 2

    @property
    def reg_channels(self) -> int:
        n = self.per_loc_bin_num * (4 if self.xz_fine else 2)
        return n + 1 + self.num_head_bin * 2 + 3


def decode(
    base_xyz: jnp.ndarray,  # (N, 3) anchor point / roi center
    pred: jnp.ndarray,  # (N, C)
    anchor_size: jnp.ndarray,  # (3,)
    cfg: CodecCfg,
    base_ry: jnp.ndarray | None = None,  # (N,) roi yaw for canonical decode
) -> jnp.ndarray:
    """-> (N, 7) xyzhwl_ry; y is the box CENTER y (caller shifts to bottom)."""
    nbin = cfg.per_loc_bin_num
    x_bin = jnp.argmax(pred[:, 0:nbin], axis=1)
    z_bin = jnp.argmax(pred[:, nbin : nbin * 2], axis=1)
    pos_x = x_bin * cfg.loc_bin_size + cfg.loc_bin_size / 2 - cfg.loc_scope
    pos_z = z_bin * cfg.loc_bin_size + cfg.loc_bin_size / 2 - cfg.loc_scope
    off = nbin * 2
    if cfg.xz_fine:
        xr = jnp.take_along_axis(pred[:, off : off + nbin], x_bin[:, None], 1)[:, 0]
        zr = jnp.take_along_axis(pred[:, off + nbin : off + 2 * nbin], z_bin[:, None], 1)[:, 0]
        pos_x = pos_x + xr * cfg.loc_bin_size
        pos_z = pos_z + zr * cfg.loc_bin_size
        off += 2 * nbin
    pos_y = base_xyz[:, 1] + pred[:, off]
    off += 1
    nh = cfg.num_head_bin
    ry_bin = jnp.argmax(pred[:, off : off + nh], axis=1)
    ry_res_norm = jnp.take_along_axis(pred[:, off + nh : off + 2 * nh], ry_bin[:, None], 1)[:, 0]
    if cfg.ry_fine:
        per = (math.pi / 2) / nh
        ry = ry_bin * per + per / 2 + ry_res_norm * (per / 2) - math.pi / 4
    else:
        per = (2 * math.pi) / nh
        ry = (ry_bin * per + ry_res_norm * (per / 2)) % (2 * math.pi)
        ry = jnp.where(ry > math.pi, ry - 2 * math.pi, ry)
    off += 2 * nh
    hwl = pred[:, off : off + 3] * anchor_size + anchor_size

    box = jnp.concatenate(
        [pos_x[:, None], pos_y[:, None], pos_z[:, None], hwl, ry[:, None]], axis=-1
    )
    if base_ry is not None:
        # canonical decode: rotate the shifted box back by roi yaw
        c, s = jnp.cos(-base_ry), jnp.sin(-base_ry)
        x, z = box[:, 0], box[:, 2]
        box = box.at[:, 0].set(x * c - z * s).at[:, 2].set(x * s + z * c)
        box = box.at[:, 6].add(base_ry)
    return box.at[:, 0].add(base_xyz[:, 0]).at[:, 2].add(base_xyz[:, 2])


def reg_loss(
    pred: jnp.ndarray,  # (N, C)
    reg_label: jnp.ndarray,  # (N, 7): dx, dy, dz (center offsets), h, w, l, ry
    mask: jnp.ndarray,  # (N,) float weights
    anchor_size: jnp.ndarray,
    cfg: CodecCfg,
):
    """Masked bin-based loss -> (loc, angle, size) means over mask
    (loss_utils.get_reg_loss:100-273)."""
    nbin = cfg.per_loc_bin_num
    m = mask.astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)

    def ce(logits, label):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(lp, label[:, None], 1)[:, 0]

    def sl1(x):
        ax = jnp.abs(x)
        return jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)

    x_shift = jnp.clip(reg_label[:, 0] + cfg.loc_scope, 0, cfg.loc_scope * 2 - 1e-3)
    z_shift = jnp.clip(reg_label[:, 2] + cfg.loc_scope, 0, cfg.loc_scope * 2 - 1e-3)
    x_bin = jnp.floor(x_shift / cfg.loc_bin_size).astype(jnp.int32)
    z_bin = jnp.floor(z_shift / cfg.loc_bin_size).astype(jnp.int32)
    loc = jnp.sum(ce(pred[:, 0:nbin], x_bin) * m) / denom
    loc += jnp.sum(ce(pred[:, nbin : 2 * nbin], z_bin) * m) / denom
    off = 2 * nbin
    if cfg.xz_fine:
        xr_lbl = (x_shift - (x_bin * cfg.loc_bin_size + cfg.loc_bin_size / 2)) / cfg.loc_bin_size
        zr_lbl = (z_shift - (z_bin * cfg.loc_bin_size + cfg.loc_bin_size / 2)) / cfg.loc_bin_size
        xr = jnp.take_along_axis(pred[:, off : off + nbin], x_bin[:, None], 1)[:, 0]
        zr = jnp.take_along_axis(pred[:, off + nbin : off + 2 * nbin], z_bin[:, None], 1)[:, 0]
        loc += jnp.sum(sl1(xr - xr_lbl) * m) / denom
        loc += jnp.sum(sl1(zr - zr_lbl) * m) / denom
        off += 2 * nbin
    loc += jnp.sum(sl1(pred[:, off] - reg_label[:, 1]) * m) / denom
    off += 1

    nh = cfg.num_head_bin
    ry_label = reg_label[:, 6]
    if cfg.ry_fine:
        per = (math.pi / 2) / nh
        ry2 = ry_label % (2 * math.pi)
        opposite = (ry2 > math.pi * 0.5) & (ry2 < math.pi * 1.5)
        ry2 = jnp.where(opposite, (ry2 + math.pi) % (2 * math.pi), ry2)
        shift = (ry2 + math.pi * 0.5) % (2 * math.pi)
        shift = jnp.clip(shift - math.pi * 0.25, 1e-3, math.pi * 0.5 - 1e-3)
        ry_bin = jnp.floor(shift / per).astype(jnp.int32)
        ry_res_lbl = (shift - (ry_bin * per + per / 2)) / (per / 2)
    else:
        per = (2 * math.pi) / nh
        heading = ry_label % (2 * math.pi)
        shift = (heading + per / 2) % (2 * math.pi)
        ry_bin = jnp.floor(shift / per).astype(jnp.int32)
        ry_res_lbl = (shift - (ry_bin * per + per / 2)) / (per / 2)
    angle = jnp.sum(ce(pred[:, off : off + nh], ry_bin) * m) / denom
    ry_res = jnp.take_along_axis(pred[:, off + nh : off + 2 * nh], ry_bin[:, None], 1)[:, 0]
    angle += jnp.sum(sl1(ry_res - ry_res_lbl) * m) / denom
    off += 2 * nh

    size_lbl = (reg_label[:, 3:6] - anchor_size) / anchor_size
    size = jnp.sum(sl1(pred[:, off : off + 3] - size_lbl) * m[:, None]) / denom
    return loc, angle, size
