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
import jax
import jax.numpy as jnp

# tests set this True to run the fused-pool Pallas kernel interpreted on CPU
_FORCE_INTERPRET = False


def _sa_min_c0() -> int:
    """Channel gate for the fused SA kernels (DISPRCNN_SA_MIN_C0 overrides;
    64 by default — below that the MXU dots are lane-starved and the win is
    unmeasured). Read at trace time for on-chip A/B without code edits."""
    import os

    return int(os.environ.get("DISPRCNN_SA_MIN_C0", "64"))

from ...ops.pallas import kernel_disabled
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


class _SlicedDense(nn.Module):
    """nn.Dense with a column-sliceable kernel. Param tree (name/shape/init)
    is IDENTICAL to nn.Dense — checkpoints and the torch importer see no
    difference — but the kernel's input-column blocks can be applied
    separately (needed to factor a SharedMLP's first layer through the
    neighbourhood gather without re-rounding raw coordinates, see
    SharedMLP.__call__)."""

    in_features: int
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )

    def __call__(self, x, cols=None, with_bias=True):
        k = self.kernel if cols is None else self.kernel[cols[0]:cols[1]]
        x = x.astype(self.dtype)
        k = k.astype(self.dtype)
        if k.shape[0] <= 4:
            # a K=3 contraction pads the MXU's 128-deep systolic dim 42x
            # (measured 1.7 ms for the xyz term at the RCNN geometry); the
            # unrolled broadcast mul+add rides the VPU and fuses with the
            # surrounding add/BN/ReLU
            y = sum(x[..., c:c + 1] * k[c] for c in range(k.shape[0]))
        else:
            y = x @ k
        if self.use_bias and with_bias:
            y = y + self.bias.astype(self.dtype)
        return y


class _RawDense(nn.Module):
    """Param-only twin of nn.Dense (same names/shapes/init): lets the fused
    eval path read mlp{i} weights without applying the layer. Only ever
    called at APPLY time (init always runs the XLA path, which creates the
    params through the real nn.Dense)."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return k, b


class _RawBN(nn.Module):
    """Param-only twin of nn.BatchNorm (scale/bias + batch_stats mean/var)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class SharedMLP(nn.Module):
    """Stack of 1x1 conv + (BN) + ReLU over the last axis.

    `factored` calling convention (grouping is LINEAR, so layer 0 commutes
    with the neighbourhood gather): the FEATURE columns of mlp0 are applied
    once at the N source points and the C0-wide result is gathered, while
    the 3 xyz columns are applied per-group on the centered f32-gathered
    coordinates (cheap: Cin=3). This moves the widest matmul of the stack
    from the (B, M, S, ·) grouped domain (M*S >> N: 8192 vs 512 at the RCNN
    geometry, ~66 GFLOP) to the (B, N, ·) point domain (~4 GFLOP), with the
    SAME rounding structure as the literal path (xyz centered in f32 before
    the bf16 cast — applying mlp0 to RAW coordinates and subtracting the
    center term afterwards would amplify bf16 rounding ~|x|/radius-fold by
    cancellation). Valid whenever BN is off or frozen (eval): BN train
    stats are computed over the grouped domain, which does not commute.
    """

    channels: Sequence[int]
    use_bn: bool = True
    dtype: Any = jnp.float32

    def _folded_chain(self, start: int, in0: int):
        """Folded (W, b) per layer [start..): Dense kernel with the eval BN
        affine absorbed — shared by the fused eval kernels."""
        import jax.lax as lax

        weights = []
        for i in range(start, len(self.channels)):
            cin = in0 if i == start else self.channels[i - 1]
            k, bi = _RawDense(
                self.channels[i], cin, use_bias=not self.use_bn,
                name=f"mlp{i}",
            )()
            if self.use_bn:
                si, ti, mi, vi = _RawBN(self.channels[i], name=f"bn{i}")()
                mm = si * lax.rsqrt(vi + 1e-5)
                k = k * mm[None, :]
                bi = ti - mi * mm
            weights.append((k, bi))
        return weights

    @nn.compact
    def __call__(self, x=None, train: bool = False, *, factored=None,
                 factored_max=None, ball=None, fp=None):
        if fp is not None:
            # fused 3-NN + interpolate + concat + MLP (ops/pallas/fp_fused);
            # FPModule gates this call (eval, TPU, not initializing)
            from ...ops.pallas.fp_fused import fp_fused

            unknown, known, known_feats, unknown_feats = fp
            weights = self._folded_chain(
                0, known_feats.shape[-1] + unknown_feats.shape[-1])
            return fp_fused(
                unknown, known, known_feats.astype(self.dtype),
                unknown_feats.astype(self.dtype), tuple(weights),
                interpret=_FORCE_INTERPRET,
            ).astype(self.dtype)
        start = 0
        pool = factored_max is not None
        if pool:
            factored = factored_max
        if factored is not None:
            feats, grouped_xyz, gather = factored
            # grouped_xyz may be a zero-arg THUNK (lazy centered gather from
            # _fused_group_mlp) or a plain array from other callers
            gx_fn = (
                grouped_xyz if callable(grouped_xyz)
                else (None if grouped_xyz is None else (lambda: grouped_xyz))
            )
            fused_common = (
                pool
                and ball is not None
                and feats is not None
                and gx_fn is not None
                and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
                and not self.is_initializing()
                and self.channels[0] >= _sa_min_c0()
            )
            if fused_common and not train and not kernel_disabled("sa"):
                # whole-scale mega-kernel: ball query + gathers + MLP + max
                # in one VMEM pass (ops/pallas/sa_fused.py). The idx/gx
                # operands of the fallback path below are dead under jit
                # and DCE'd.
                return self._fused_ball_pool(ball, feats)
            if (fused_common and train and not self.use_bn
                    and self.dtype == jnp.bfloat16
                    and not kernel_disabled("satrain")):
                # train-path fused SA (VERDICT r4 ask #6): mega-kernel fwd +
                # XLA-oracle custom_vjp bwd. BN-free scales only (RCNN):
                # train-mode BN stats need the grouped domain. bf16 models
                # only — the kernel computes in bf16 internally, and
                # silently bf16-ing an f32 model's forward shifts its max-
                # pool selections (~15% grad divergence measured on a tiny
                # f32 RCNNNet); for bf16 models both paths round alike.
                return self._fused_ball_pool(ball, feats, train=True)
            nxyz = 0 if gx_fn is None else 3
            nfeat = 0 if feats is None else feats.shape[-1]
            dense0 = _SlicedDense(
                nxyz + nfeat, self.channels[0], use_bias=not self.use_bn,
                dtype=self.dtype, name="mlp0",
            )
            if feats is not None:
                v = dense0(feats, cols=(nxyz, nxyz + nfeat))  # (B, N, C0) + bias
                x = gather(v)  # (B, M, S, C0)
                if gx_fn is not None:
                    x = x + dense0(
                        gx_fn().astype(self.dtype), cols=(0, 3),
                        with_bias=False,
                    )
            else:
                x = dense0(gx_fn().astype(self.dtype), cols=(0, 3))
            if (
                pool
                and not train
                and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
                and not kernel_disabled("pool")
                and not self.is_initializing()
                and self.channels[0] >= _sa_min_c0()
            ):
                # fused grouped MLP + max (ops/pallas/grouped_mlp.py): the
                # (B, M, S, C) activations of every layer otherwise round-
                # trip HBM (mlp1+mlp2+max = 3.85 ms at the RCNN SA0 geometry
                # vs ~1.4 fused). BN affines fold into the input transform /
                # layer weights at eval (running stats).
                return self._fused_pool(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name="bn0", dtype=self.dtype,
                )(x)
            x = nn.relu(x)
            start = 1
        for i in range(start, len(self.channels)):
            x = nn.Dense(
                self.channels[i], use_bias=not self.use_bn, dtype=self.dtype,
                name=f"mlp{i}",
            )(x)
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
        if pool:
            x = jnp.max(x, axis=2)
        return x

    def _fused_ball_pool(self, ball, feats, train: bool = False):
        """Whole-scale fused pass: distances, rank-one-hot ball query,
        gathers, factored mlp0 + BN0 + ReLU, mlp1..k, max over S — one
        Pallas kernel per batch row (ops/pallas/sa_fused.py). mlp0's
        feature columns are pre-applied at the N source points here (the
        factored-path algebra); its xyz columns go in raw for the kernel's
        f32-centered VPU term. train=True (BN-free scales only) routes
        through the custom_vjp wrapper: same kernel forward, XLA-oracle
        backward."""
        import jax.lax as lax

        from ...ops.pallas.sa_fused import (
            sa_ball_mlp_max,
            sa_ball_mlp_max_train,
        )

        xyz, new_xyz, radius, nsample = ball
        c0 = self.channels[0]
        nfeat = feats.shape[-1]
        k0, b0 = _RawDense(c0, 3 + nfeat, use_bias=not self.use_bn,
                           name="mlp0")()
        dt = self.dtype
        v = feats.astype(dt) @ k0[3:].astype(dt)  # as _SlicedDense cols=(3,·)
        if b0 is not None:
            v = v + b0.astype(dt)
        if self.use_bn:
            s0, t0, m0, v0 = _RawBN(c0, name="bn0")()
            mul0 = s0 * lax.rsqrt(v0 + 1e-5)
            add0 = t0 - m0 * mul0
        else:
            mul0 = jnp.ones((c0,), jnp.float32)
            add0 = jnp.zeros((c0,), jnp.float32)
        weights = self._folded_chain(1, self.channels[0])
        if train:  # custom_vjp: positional args only
            out = sa_ball_mlp_max_train(
                xyz, new_xyz, v, k0[:3], mul0, add0, tuple(weights),
                float(radius), nsample, _FORCE_INTERPRET,
            )
        else:
            out = sa_ball_mlp_max(
                xyz, new_xyz, v, k0[:3], mul0, add0, tuple(weights),
                float(radius), nsample, interpret=_FORCE_INTERPRET,
            )
        return out.astype(self.dtype)

    def _fused_pool(self, x):
        """Eval-only: relu(x*bn0) -> mlp1..k (+folded BN, ReLU) -> max over S,
        one Pallas pass. Raw param twins read the same tree the XLA path
        creates at init."""
        import jax.lax as lax

        from ...ops.pallas.grouped_mlp import grouped_mlp_max

        c0 = self.channels[0]
        if self.use_bn:
            s0, t0, m0, v0 = _RawBN(c0, name="bn0")()
            mul0 = s0 * lax.rsqrt(v0 + 1e-5)
            add0 = t0 - m0 * mul0
        else:
            mul0 = jnp.ones((c0,), jnp.float32)
            add0 = jnp.zeros((c0,), jnp.float32)
        weights = self._folded_chain(1, self.channels[0])
        b, m, s, _ = x.shape
        out = grouped_mlp_max(
            x.reshape(b * m, s, c0).astype(jnp.bfloat16),
            mul0, add0, tuple(weights),
            interpret=_FORCE_INTERPRET,  # tests: kernel-on-CPU parity
        )
        return out.reshape(b, m, -1).astype(self.dtype)


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


def _fused_group_mlp(
    mlp_mod, xyz, features, new_xyz, radius, nsample, use_xyz, use_bn, train
):
    """Ball-grouped SharedMLP + neighbourhood max -> (B, M, C_last).

    mlp0's feature columns factor to run at the N source points (SharedMLP
    factored path); the gathers stay on the idx-one-hot MXU contraction of
    group_points. (A rank-derived one-hot that skips the index pass entirely
    was tried: its two-operand broadcast producer does NOT fuse into the
    dot — XLA materializes the (B, M*S, N) operand in HBM, rcnn_net
    15 -> 34 ms. The shallow idx == iota compare fuses.) The layers after
    mlp0 + the max pool run as one fused Pallas pass at eval (SharedMLP.
    _fused_pool). Falls back to the literal grouped path when BN is in
    training mode (its stats are over the grouped domain)."""
    if train and use_bn:
        g = sample_and_group(xyz, features, new_xyz, radius, nsample, use_xyz)
        return jnp.max(mlp_mod(g, train), axis=2)
    # idx/gx are LAZY: when the sa mega-kernel path is taken they are
    # never computed (under jit they would be DCE'd anyway, but eager
    # apply() — tests, debugging — would pay the full ball_query + gather)
    def _idx():
        if "idx" not in _c:
            _c["idx"] = ball_query(new_xyz, xyz, radius, nsample)
        return _c["idx"]

    _c = {}
    gx = (
        (lambda: group_points(xyz, _idx()) - new_xyz[:, :, None, :])
        if use_xyz else None
    )
    return mlp_mod(
        train=train,
        factored_max=(features, gx, lambda v: group_points(v, _idx())),
        ball=(xyz, new_xyz, radius, nsample),
    )


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
            outs.append(_fused_group_mlp(  # (B, M, C_i), max-pooled
                SharedMLP(mlp, self.use_bn, self.dtype, name=f"mlp_scale{i}"),
                xyz, features, new_xyz, r, ns, self.use_xyz, self.use_bn, train,
            ))
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
        g = _fused_group_mlp(
            SharedMLP(self.mlp, self.use_bn, self.dtype, name="mlp"),
            xyz, features, new_xyz, self.radius, self.nsample, self.use_xyz,
            self.use_bn, train,
        )
        return new_xyz, g


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + SharedMLP."""

    mlp: Sequence[int]
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train: bool = False):
        mlp_mod = SharedMLP(self.mlp, self.use_bn, self.dtype, name="mlp")
        if (
            known is not None
            and unknown_feats is not None
            and not train
            and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
            and not kernel_disabled("fp")
            and not self.is_initializing()
        ):
            # fused 3-NN + interp + concat + MLP in one VMEM pass
            return mlp_mod(
                train=train,
                fp=(unknown, known, known_feats, unknown_feats),
            )
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
        return mlp_mod(interp[:, :, None, :], train)[:, :, 0, :]


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
        # level count follows npoints (a shorter tuple — e.g. the multichip
        # dryrun's 3-level config — uses the first k SA/FP defaults)
        for i in range(len(self.npoints) - 1, -1, -1):
            l_feats[i] = FPModule(
                mlp=self.fp_mlps[i], use_bn=self.use_bn, dtype=self.dtype, name=f"fp{i}",
            )(l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1], train)
        return l_xyz[0], l_feats[0]
