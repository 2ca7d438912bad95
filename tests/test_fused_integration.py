"""Composed-model integration tests for the fused Pallas kernels.

Unit parity (tests/test_pallas_kernels.py, test_ops.py) checks each kernel
against its oracle in isolation; these run the WHOLE eval models with
_FORCE_INTERPRET=True so every kernel executes at its real call site —
wrong argument wiring, gate/geometry mismatches, or layout bugs between
consecutive kernels show up here, not on the first TPU attach.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_psmnet_full_forward_fused_interpret(rng):
    """Full PSMNet eval forward with ALL trunk/tower kernels interpreted
    (cost-volume conv, pair, s1 multi-row, s2, deconv+residuals, classif
    out_repack, W-packed tower, fused softargmin) vs the XLA path."""
    import disprcnn_tpu.models.psmnet.psmnet as psm
    from disprcnn_tpu.models.psmnet.psmnet import PSMNet

    # 160x160 crops: quarter res 40x40 -> hw=1600 >= the rows gate, so the
    # full-res s1 kernels engage at rows=1 and the half/quarter-res ones at
    # rows>1 (B*dg = 12 rows)
    b, h, w = 2, 160, 160
    left = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32))
    model = PSMNet(maxdisp=48, mindisp=-48, dtype=jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)}, left, right, train=False)
    # non-trivial BN stats so the affine folds are exercised
    v = dict(v)
    v["batch_stats"] = jax.tree.map(
        lambda a: a + 0.1 * jnp.abs(jnp.asarray(
            rng.normal(size=a.shape), a.dtype)),
        v["batch_stats"],
    )

    want = model.apply(v, left, right, train=False)  # XLA path (cpu backend)
    try:
        psm._FORCE_INTERPRET = True
        got = model.apply(v, left, right, train=False)
    finally:
        psm._FORCE_INTERPRET = False

    want = np.asarray(want, np.float32)
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape == (b, h, w)
    # Disparities span [-48, 48). On RANDOM weights the soft-argmin sits on
    # a near-uniform softmax, so per-kernel bf16 reassociation (each family
    # adds ~0.02-0.16 mean disparity drift; the kernels apply the BN affine
    # in f32 where the XLA _PackedBN multiplies in bf16) wanders the
    # expectation — measured mean 0.23 / max 1.7 across ~30 fused convs,
    # shrinking on trained (peaked) volumes. The gate below catches wiring
    # bugs (which produce range-scale garbage), not association drift.
    err = np.abs(got - want)
    # bf16 association drift is never exactly zero: identical outputs would
    # mean the kernel gates silently stopped engaging
    assert err.max() > 0, "fused kernels did not engage"
    assert err.mean() < 0.5, err.mean()
    assert np.percentile(err, 99) < 2.0, np.percentile(err, 99)
    assert err.max() < 5.0, err.max()


@pytest.mark.slow
def test_rpn3d_forward_fused_interpret(rng):
    """RPN3D (PointNet++ MSG encoder + FP decoder) eval forward with the
    sa/pool/fp kernels interpreted vs the XLA path."""
    import disprcnn_tpu.models.pointrcnn.pointnet2 as pn2
    from disprcnn_tpu.models.pointrcnn.rpn3d import RPN3D

    r, n = 2, 128
    pts = jnp.asarray(rng.normal(size=(r, n, 3)).astype(np.float32)) * 2.0
    model = RPN3D(npoints=(128, 64, 32, 16), dtype=jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
    v = dict(v)
    v["batch_stats"] = jax.tree.map(
        lambda a: a + 0.1 * jnp.abs(jnp.asarray(
            rng.normal(size=a.shape), a.dtype)),
        v["batch_stats"],
    )

    want = model.apply(v, pts, train=False)
    try:
        pn2._FORCE_INTERPRET = True
        got = model.apply(v, pts, train=False)
    finally:
        pn2._FORCE_INTERPRET = False

    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            rtol=6e-2, atol=6e-2, err_msg=k)


@pytest.mark.slow
def test_psmnet_train_grads_fused_interpret(rng):
    """TRAIN-path integration for the custom_vjp conv (convtrain family):
    full PSMNet train=True forward + parameter gradients with the Pallas
    fwd/XLA-transpose bwd engaged at every stride-1 trunk site, vs the pure
    XLA path. f32, so the only allowed difference is accumulation order."""
    import os

    import disprcnn_tpu.models.psmnet.psmnet as psm
    from disprcnn_tpu.models.psmnet.psmnet import PSMNet

    # 96^2 crops: quarter res 24^2 -> eff=576, N=B*dg=4 rows -> rows=4,
    # eff*rows=2304 >= 1500 so the convtrain gate engages (same gate as the
    # eval conv3d family)
    b, h, w = 2, 96, 96
    left = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32))
    model = PSMNet(maxdisp=16, mindisp=-16, dtype=jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, left, right, train=False)

    def loss(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            left, right, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.mean(p * p) for p in preds)

    lx, gx = jax.value_and_grad(loss)(v["params"])
    assert os.environ.get("DISPRCNN_PALLAS_DISABLE", "") == ""
    try:
        psm._FORCE_INTERPRET = True
        lp, gp = jax.value_and_grad(loss)(v["params"])
    finally:
        psm._FORCE_INTERPRET = False

    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = {jax.tree_util.keystr(k): a
              for k, a in jax.tree_util.tree_leaves_with_path(gp)}
    # Two gates: per-leaf RELATIVE FROBENIUS error plus a loose max-entry
    # bound. Measured divergence tops out ~1.7e-3 and sits in the FEATURE
    # TOWER's BN biases — layers that are pure XLA in BOTH runs, at the far
    # end of the backprop chain: pure f32 reassociation accumulated through
    # ~40 layers of bwd (the loss itself agrees to 1e-7 relative, and the
    # op-level unit test pins the kernel to 1e-4). The gates exist to catch
    # wiring bugs, which produce O(1) divergence, not O(1e-3).
    worst_n, worst_m = 0.0, 0.0
    for k, ax in flat_x:
        ap = np.asarray(flat_p[jax.tree_util.keystr(k)], np.float64)
        ax = np.asarray(ax, np.float64)
        dn = np.linalg.norm(ap - ax) / max(np.linalg.norm(ax), 1e-6)
        dm = np.abs(ap - ax).max() / max(np.abs(ax).max(), 1e-6)
        worst_n, worst_m = max(worst_n, dn), max(worst_m, dm)
    assert worst_n < 5e-3, f"relative grad norm divergence {worst_n:.2e}"
    assert worst_m < 3e-2, f"max relative grad entry divergence {worst_m:.2e}"


@pytest.mark.slow
def test_rcnn_train_grads_fused_sa_interpret(rng):
    """TRAIN-path integration for the custom_vjp SA (satrain family,
    VERDICT r4 ask #6): RCNNNet train=True forward + parameter gradients
    with the fused SA mega-kernel forward engaged at the BN-free SA scales
    vs the pure XLA path. bf16 model (the satrain gate requires it: the
    kernel computes in bf16, so an f32 model would get a silently rounded
    forward); grads come from the XLA-oracle backward, so divergence vs
    the pure-XLA run is bf16 forward rounding through the cotangents."""
    import disprcnn_tpu.models.pointrcnn.pointnet2 as pn2
    from disprcnn_tpu.models.pointrcnn.rcnn3d import RCNNNet

    b, n = 6, 64
    pts = jnp.asarray(rng.normal(size=(b, n, 133)).astype(np.float32) * 0.5)
    model = RCNNNet(dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, n, 133)), False)

    def loss(params):
        cls, reg = model.apply(params, pts, True)
        return jnp.mean(cls * cls) + jnp.mean(reg * reg)

    lx, gx = jax.value_and_grad(loss)(v)
    try:
        pn2._FORCE_INTERPRET = True
        lp, gp = jax.value_and_grad(loss)(v)
    finally:
        pn2._FORCE_INTERPRET = False

    # Gates sized for what this test can promise: the kernel fwd and the
    # XLA fwd differ by bf16 association, and on RANDOM weights the SA
    # max-pools sit on near-ties — a flipped argmax reroutes that
    # neighbour's gradient entirely, so individual leaves legitimately
    # diverge tens of percent through 3 stacked SAs (the eval parity
    # tests allow 4e-2 PER SA at the output level for the same reason).
    # Wiring bugs (wrong weights/centers/slots) produce O(1) divergence
    # in EVERY leaf and a wrong loss; that is what these catch.
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-2)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = {jax.tree_util.keystr(k): a
              for k, a in jax.tree_util.tree_leaves_with_path(gp)}
    divs = []
    for k, ax in flat_x:
        ap = np.asarray(flat_p[jax.tree_util.keystr(k)], np.float64)
        ax = np.asarray(ax, np.float64)
        divs.append(np.linalg.norm(ap - ax) / max(np.linalg.norm(ax), 1e-6))
    assert np.median(divs) < 0.15, f"median grad divergence {np.median(divs):.2e}"
    assert max(divs) < 0.6, f"worst grad divergence {max(divs):.2e}"
