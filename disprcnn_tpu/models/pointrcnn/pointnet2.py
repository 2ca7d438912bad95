"""PointNet++ set-abstraction / feature-propagation modules (Flax, channel-last).

Reference: .../pointnet2_lib/pointnet2/pointnet2_modules.py:10-157 and
pytorch_utils.py (SharedMLP). The CUDA primitives (FPS, ball query, grouping,
three-NN) come from disprcnn_tpu.ops.points.

Layout: points (B, N, 3), features (B, N, C) — channels on TPU lanes. A
SharedMLP over grouped neighbourhoods is a 1x1 conv == batched matmul on the
MXU.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.points import (
    ball_query,
    fps_or_identity,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
    three_nn_interpolate_weights,
)


class SharedMLP(nn.Module):
    """Stack of 1x1 conv + (BN) + ReLU over the last axis."""

    channels: Sequence[int]
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.use_bn, dtype=self.dtype, name=f"mlp{i}")(x)
            if self.use_bn:
                # dtype: keep activations in the compute dtype — the flax
                # default promotes BN outputs to f32, doubling the HBM
                # traffic of every grouped (B, M, S, C) block and the
                # max-pool reductions that consume them (stats still
                # accumulate in f32 inside flax)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"bn{i}", dtype=self.dtype,
                )(x)
            x = nn.relu(x)
        return x


def sample_and_group(
    xyz: jnp.ndarray,  # (B, N, 3)
    features: Optional[jnp.ndarray],  # (B, N, C) or None
    new_xyz: jnp.ndarray,  # (B, M, 3)
    radius: float,
    nsample: int,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """-> grouped (B, M, nsample, 3[+C]) with centered xyz.

    xyz and features are gathered SEPARATELY: both group_points einsums share
    one CSE'd one-hot operand, while a fused concat-then-gather variant makes
    XLA re-lay-out the (B, M, S, 3+C) block (measured +5.5 ms of pure copies
    on the RCNN stage)."""
    idx = ball_query(new_xyz, xyz, radius, nsample)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feats = group_points(features, idx)
        if use_xyz:
            # match the feature dtype: concat would otherwise promote the
            # whole (B, M, S, 3+C) block to f32 and double its HBM traffic.
            # The xyz entries are radius-bounded LOCAL offsets, well inside
            # bf16's relative precision.
            return jnp.concatenate(
                [grouped_xyz.astype(grouped_feats.dtype), grouped_feats], axis=-1
            )
        return grouped_feats
    return grouped_xyz


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (PointnetSAModuleMSG)."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        # FPS with npoint possibly >= N: identity (order-invariant consumers)
        idx = fps_or_identity(xyz, self.npoint)
        new_xyz = xyz if idx is None else gather_points(xyz, idx)
        outs = []
        for i, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples, self.mlps)):
            g = sample_and_group(xyz, features, new_xyz, r, ns, self.use_xyz)
            g = SharedMLP(mlp, self.use_bn, self.dtype, name=f"mlp_scale{i}")(g, train)
            outs.append(jnp.max(g, axis=2))  # (B, M, C_i)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SAModule(nn.Module):
    """Single-scale SA; npoint=None means group-all (PointnetSAModule)."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    use_xyz: bool = True
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        if self.npoint is None:
            # group all: one neighbourhood containing every point
            g = xyz[:, None, :, :]
            if features is not None:
                g = jnp.concatenate([g, features[:, None]], axis=-1) if self.use_xyz else features[:, None]
            g = SharedMLP(self.mlp, self.use_bn, self.dtype, name="mlp")(g, train)
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            return new_xyz, jnp.max(g, axis=2)
        idx = fps_or_identity(xyz, self.npoint)
        new_xyz = xyz if idx is None else gather_points(xyz, idx)
        g = sample_and_group(xyz, features, new_xyz, self.radius, self.nsample, self.use_xyz)
        g = SharedMLP(self.mlp, self.use_bn, self.dtype, name="mlp")(g, train)
        return new_xyz, jnp.max(g, axis=2)


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + SharedMLP."""

    mlp: Sequence[int]
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train: bool = False):
        if known is not None:
            d, idx = three_nn(unknown, known)
            w = three_nn_interpolate_weights(d)
            interp = three_interpolate(known_feats, idx, w)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, self.use_bn, self.dtype, name="mlp")(interp[:, :, None, :], train)[:, :, 0, :]


class Pointnet2MSG(nn.Module):
    """4-level MSG encoder + 4 FP decoders (reference pointnet2_msg.py:10-70)."""

    npoints: Sequence[int] = (4096, 1024, 256, 64)
    radii: Sequence[Sequence[float]] = ((0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0))
    nsamples: Sequence[Sequence[int]] = ((16, 32),) * 4
    mlps: Sequence[Sequence[Sequence[int]]] = (
        ((16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 96, 128)),
        ((128, 196, 256), (128, 196, 256)),
        ((256, 256, 512), (256, 384, 512)),
    )
    fp_mlps: Sequence[Sequence[int]] = ((128, 128), (256, 256), (512, 512), (512, 512))
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        l_xyz, l_feats = [xyz], [features]
        for k in range(len(self.npoints)):
            nx, nf = SAModuleMSG(
                npoint=self.npoints[k], radii=self.radii[k], nsamples=self.nsamples[k],
                mlps=self.mlps[k], use_bn=self.use_bn, dtype=self.dtype, name=f"sa{k}",
            )(l_xyz[k], l_feats[k], train)
            l_xyz.append(nx)
            l_feats.append(nf)
        for i in range(len(self.fp_mlps) - 1, -1, -1):
            l_feats[i] = FPModule(
                mlp=self.fp_mlps[i], use_bn=self.use_bn, dtype=self.dtype, name=f"fp{i}",
            )(l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1], train)
        return l_xyz[0], l_feats[0]
