"""Decomposed cost-volume conv (ops/cv_conv.py) vs the packed-3D-conv oracle.

The claim: cost_volume_conv_decomposed(lf, rf, K, mind4, maxd4, G) ==
conv3d_packed_r4(build_cost_volume_packed(lf, rf, mind4, maxd4, G), K, G, Dg)
exactly (f32), i.e. the 2D-conv identity + per-column boundary corrections
reproduce the dense conv3d over the structured volume the reference builds
(stackhourglass.py:117-128) — at ~24x fewer true FLOPs. Geometries cover
negative/zero/positive disparity ranges, odd widths, and both depth edges.
Plus: the model-level wiring (PSMNet with the 'cvdec' family on vs off)
agrees in eval AND in train with gradients.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disprcnn_tpu.models.psmnet.psmnet import build_cost_volume_packed
from disprcnn_tpu.ops.conv3d_packed import conv3d_packed_r4
from disprcnn_tpu.ops.cv_conv import cost_volume_conv_decomposed


@pytest.mark.parametrize(
    "b,h,w,c,mind,maxd,co",
    [
        (2, 10, 14, 5, -4, 8, 7),
        (1, 8, 13, 4, -8, 8, 4),     # odd width, symmetric range
        (2, 6, 9, 3, 0, 8, 5),       # mind = 0: edge slice carries dd = 0
        (1, 7, 11, 4, -8, 0, 6),     # maxd = 0: all-negative disparities
        (2, 12, 20, 6, -12, 12, 8),  # trunk-like D=24
    ],
)
def test_cv_conv_decomposed_matches_packed(b, h, w, c, mind, maxd, co):
    g = 4
    rng = np.random.default_rng(b * 100 + w)
    lf = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    rf = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 3, 2 * c, co)) * 0.2).astype(np.float32))
    dg = (maxd - mind) // g
    want = conv3d_packed_r4(
        build_cost_volume_packed(lf, rf, mind, maxd, g), k, g, dg)
    got = cost_volume_conv_decomposed(lf, rf, k, mind, maxd, g)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def _tiny_psmnet():
    from disprcnn_tpu.models.psmnet.psmnet import PSMNet

    return PSMNet(maxdisp=8, mindisp=-8, num_hourglass=1, dtype=jnp.float32)


def _ab_cvdec(train: bool, rng):
    """Full tiny-PSMNet forward with cvdec ON vs OFF."""
    psm = _tiny_psmnet()
    left = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    right = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = psm.init({"params": jax.random.PRNGKey(0)}, left, right, train=False)

    def run(disable):
        old = os.environ.get("DISPRCNN_PALLAS_DISABLE")
        old_en = os.environ.get("DISPRCNN_PALLAS_ENABLE")
        try:
            os.environ["DISPRCNN_PALLAS_DISABLE"] = disable
            # bypass the W*D geometry floor (psmnet.PackedConvBN3d) so the
            # "on" arm really runs the decomposition at this tiny shape
            os.environ["DISPRCNN_PALLAS_ENABLE"] = (
                "" if disable == "cvdec" else "cvdec")
            if train:
                def loss_fn(params):
                    out, _ = psm.apply(
                        {"params": params, "batch_stats": v["batch_stats"]},
                        left, right, train=True, mutable=["batch_stats"])
                    return sum(jnp.sum(o * o) for o in out)

                val, grads = jax.value_and_grad(loss_fn)(v["params"])
                return val, grads
            return psm.apply(v, left, right, train=False), None
        finally:
            if old is None:
                os.environ.pop("DISPRCNN_PALLAS_DISABLE", None)
            else:
                os.environ["DISPRCNN_PALLAS_DISABLE"] = old
            if old_en is None:
                os.environ.pop("DISPRCNN_PALLAS_ENABLE", None)
            else:
                os.environ["DISPRCNN_PALLAS_ENABLE"] = old_en

    on = run("")
    off = run("cvdec")
    return on, off


def test_psmnet_cvdec_eval_parity(rng):
    (out_on, _), (out_off, _) = _ab_cvdec(False, rng)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-4, atol=1e-4)


def test_psmnet_cvdec_train_grads_parity(rng):
    (val_on, g_on), (val_off, g_off) = _ab_cvdec(True, rng)
    np.testing.assert_allclose(float(val_on), float(val_off), rtol=1e-4)
    flat_on = jax.tree_util.tree_leaves(g_on)
    flat_off = jax.tree_util.tree_leaves(g_off)
    assert len(flat_on) == len(flat_off)
    for a, b in zip(flat_on, flat_off):
        b = np.asarray(b)
        # scale-aware: f32 reassociation noise is relative to the LEAF's
        # magnitude, not per element (near-zero elements carry it too)
        tol = 2e-4 * max(float(np.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-3, atol=tol)


def test_psmnet_cvdec_train_grads_bf16(rng):
    """bf16-dtype train grads through the cvdec branch. Regression: the
    decomposition's f32-accumulation convs made autodiff transpose an f32
    cotangent into a conv against the bf16 kernel — lax.conv rejects mixed
    dtypes. Only a bf16 MODEL reaches it (the f32 parity test above is
    dtype-uniform throughout), which is how it slipped to bench_full's
    train-psm stage. The branch now runs f32 under train."""
    import os

    from disprcnn_tpu.models.psmnet.psmnet import PSMNet

    psm = PSMNet(maxdisp=8, mindisp=-8, num_hourglass=1, dtype=jnp.bfloat16)
    left = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    right = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = psm.init({"params": jax.random.PRNGKey(0)}, left, right, train=False)
    saved = {k: os.environ.get(k)
             for k in ("DISPRCNN_PALLAS_DISABLE", "DISPRCNN_PALLAS_ENABLE")}
    try:
        os.environ["DISPRCNN_PALLAS_DISABLE"] = ""
        os.environ["DISPRCNN_PALLAS_ENABLE"] = "cvdec"  # bypass W*D floor

        def loss_fn(params):
            out, _ = psm.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                left, right, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)

        val, grads = jax.value_and_grad(loss_fn)(v["params"])
    finally:
        for k, s in saved.items():
            if s is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = s
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
