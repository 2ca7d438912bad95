import numpy as np
import jax.numpy as jnp
import pytest

import oracles
from disprcnn_tpu import ops


def rand_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(2, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_oracle(rng):
    a, b = rand_boxes(rng, 13), rand_boxes(rng, 7)
    got = np.asarray(ops.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    want = oracles.iou_matrix(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_oracle(rng, thresh):
    boxes = rand_boxes(rng, 40)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    valid = np.ones(40, bool)
    keep = np.asarray(
        ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thresh)
    )
    want = oracles.greedy_nms(boxes, scores, thresh)
    assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_nms_respects_validity(rng):
    boxes = rand_boxes(rng, 10)
    scores = rng.uniform(0, 1, 10).astype(np.float32)
    valid = np.zeros(10, bool)
    valid[:4] = True
    keep = np.asarray(
        ops.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
    )
    assert not keep[4:].any()
    want = oracles.greedy_nms(boxes[:4], scores[:4], 0.5)
    assert sorted(np.nonzero(keep[:4])[0].tolist()) == want


def test_double_view_nms_uses_union_boxes(rng):
    left = rand_boxes(rng, 20)
    right = left + np.array([5.0, 0, 5.0, 0], np.float32)
    scores = rng.uniform(0, 1, 20).astype(np.float32)
    union = np.concatenate(
        [np.minimum(left[:, :2], right[:, :2]), np.maximum(left[:, 2:], right[:, 2:])], 1
    )
    keep = np.asarray(
        ops.double_view_nms_mask(
            jnp.asarray(left), jnp.asarray(right), jnp.asarray(scores),
            jnp.ones(20, bool), 0.5,
        )
    )
    want = oracles.greedy_nms(union, scores, 0.5)
    assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_rotated_overlap_matches_sutherland_hodgman(rng):
    for _ in range(50):
        a = np.array([*rng.uniform(0, 10, 2), 0, 0, rng.uniform(-np.pi, np.pi)])
        a[2:4] = a[0:2] + rng.uniform(1, 8, 2)
        b = np.array([*rng.uniform(0, 10, 2), 0, 0, rng.uniform(-np.pi, np.pi)])
        b[2:4] = b[0:2] + rng.uniform(1, 8, 2)
        got = float(
            ops.rotated_rect_intersection_area(
                jnp.asarray(a, jnp.float32)[None], jnp.asarray(b, jnp.float32)[None]
            )[0]
        )
        want = oracles.bev_overlap(a, b)
        assert abs(got - want) < 1e-3, (a, b, got, want)


def test_rotated_overlap_identical_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 4.0, 2.0, 0.7]])
    self_ov = float(ops.rotated_rect_intersection_area(a, a)[0])
    assert abs(self_ov - 8.0) < 1e-4
    b = jnp.asarray([[100.0, 100.0, 104.0, 102.0, 0.3]])
    assert float(ops.rotated_rect_intersection_area(a, b)[0]) == 0.0


def test_iou3d_axis_aligned_case():
    # two unit cubes (h=w=l=1) overlapping by half along x: IoU = 0.5/1.5
    a = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.5, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    got = float(ops.pairwise_iou3d(a, b)[0, 0])
    assert abs(got - 0.5 / 1.5) < 1e-5


def test_fps_matches_oracle(rng):
    pts = rng.uniform(-5, 5, (1, 64, 3)).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 16))[0]
    want = oracles.fps(pts[0], 16)
    np.testing.assert_array_equal(got, want)


def test_ball_query_matches_oracle(rng):
    pts = rng.uniform(-2, 2, (1, 100, 3)).astype(np.float32)
    centers = pts[:, :10]
    got = np.asarray(ops.ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.8, 8))[0]
    want = oracles.ball_query(centers[0], pts[0], 0.8, 8)
    np.testing.assert_array_equal(got, want)


def test_three_nn_interpolate(rng):
    known = rng.uniform(-1, 1, (1, 20, 3)).astype(np.float32)
    unknown = rng.uniform(-1, 1, (1, 30, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 20, 4)).astype(np.float32)
    d, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d, idx = np.asarray(d), np.asarray(idx)
    # brute-force check for a few points
    for i in [0, 7, 29]:
        full = np.linalg.norm(unknown[0, i] - known[0], axis=1)
        want = np.sort(full)[:3]
        np.testing.assert_allclose(np.sort(d[0, i]), want, rtol=1e-4, atol=1e-5)
    w = ops.three_nn_interpolate_weights(jnp.asarray(d))
    out = ops.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), w)
    assert out.shape == (1, 30, 4)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, rtol=1e-5)


def test_roi_align_matches_oracle(rng):
    feat = rng.normal(size=(16, 20, 3)).astype(np.float32)
    boxes = np.array(
        [[2.0, 3.0, 30.0, 25.0], [0.0, 0.0, 10.0, 10.0], [15.0, 8.0, 60.0, 50.0]],
        np.float32,
    )
    got = np.asarray(
        ops.roi_align(jnp.asarray(feat), jnp.asarray(boxes), pooled=7, spatial_scale=0.5,
                      sampling_ratio=2)
    )
    for i, b in enumerate(boxes):
        want = oracles.roi_align(feat, b, 7, 0.5, 2)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_roi_align_out_of_bounds_is_zero():
    feat = jnp.ones((8, 8, 1))
    boxes = jnp.asarray([[100.0, 100.0, 120.0, 120.0]])
    out = ops.roi_align(feat, boxes, pooled=4, spatial_scale=1.0, sampling_ratio=2)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_roi_align_grad_flows(rng):
    import jax

    feat = jnp.asarray(rng.normal(size=(8, 8, 2)).astype(np.float32))
    boxes = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])

    def loss(f):
        return jnp.sum(ops.roi_align(f, boxes, pooled=2, spatial_scale=1.0, sampling_ratio=2))

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_pts_in_boxes3d_matches_oracle(rng):
    pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    boxes = np.array(
        [[0.0, 1.0, 0.0, 2.0, 1.5, 3.5, 0.6], [2.0, 0.5, -1.0, 1.0, 1.0, 2.0, -0.3]],
        np.float32,
    )
    got = np.asarray(ops.pts_in_boxes3d(jnp.asarray(pts), jnp.asarray(boxes)))
    for j, b in enumerate(boxes):
        want = oracles.pts_in_box3d(pts, b)
        np.testing.assert_array_equal(got[j], want)


def test_roipool3d_sampling_semantics(rng):
    pts = rng.uniform(-3, 3, (1, 50, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 50, 2)).astype(np.float32)
    boxes = np.array([[[0.0, 1.0, 0.0, 2.0, 3.0, 3.0, 0.0]]], np.float32)
    pooled, empty = ops.roipool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(boxes), sampled_pts_num=16
    )
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    inside = oracles.pts_in_box3d(pts[0], boxes[0, 0])
    idxs = np.nonzero(inside)[0]
    if len(idxs) == 0:
        assert empty[0, 0]
    else:
        assert not empty[0, 0]
        take = [idxs[k % len(idxs)] if k >= len(idxs) else idxs[k] for k in range(16)]
        take = [idxs[k] if k < len(idxs) else idxs[k % len(idxs)] for k in range(16)]
        want = np.concatenate([pts[0][take], feats[0][take]], axis=1)
        np.testing.assert_allclose(pooled[0, 0], want, rtol=1e-6)


def test_focal_loss_reference_formula(rng):
    logits = rng.normal(size=(6, 3)).astype(np.float32)
    targets = np.array([0, 1, 2, 3, -1, 1])
    got = np.asarray(ops.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    p = 1 / (1 + np.exp(-logits))
    for i in range(6):
        for c in range(3):
            if targets[i] < 0:
                want = 0.0
            elif targets[i] == c + 1:
                want = -0.25 * (1 - p[i, c]) ** 2 * np.log(p[i, c])
            else:
                want = -0.75 * p[i, c] ** 2 * np.log(1 - p[i, c])
            assert abs(got[i, c] - want) < 1e-4


def test_smooth_l1():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    got = np.asarray(ops.smooth_l1(x))
    np.testing.assert_allclose(got, [1.5, 0.125, 0.0, 0.125, 1.5], rtol=1e-6)


def test_roi_align_gather_matches_matrix(rng):
    """roi_align_batched_gather (point-gather form) vs roi_align_batched
    (matrix-contraction form): identical outputs by construction."""
    from disprcnn_tpu.ops.roi_align import (
        roi_align_batched, roi_align_batched_gather,
    )

    feat = jnp.asarray(rng.normal(size=(2, 24, 40, 16)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 150, (12, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 10 + boxes[:, 2:] / 3)
    bi = jnp.asarray(rng.integers(0, 2, 12).astype(np.int32))
    for pooled, s in ((7, 2), (14, 2), (5, 1)):
        a = roi_align_batched(feat, boxes, bi, pooled, 0.25, s)
        g = roi_align_batched_gather(feat, boxes, bi, pooled, 0.25, s)
        np.testing.assert_allclose(np.asarray(a), np.asarray(g), rtol=1e-5, atol=1e-5)


def test_first_k_true_production_sizes(monkeypatch, rng):
    """k=512 (roipool3d's sampled_pts_num) with >256 True entries per row,
    both branches: regression for the bf16 count branch, which was only exact
    for integers <= 256 and corrupted 128/512 slots at this size."""
    import jax as _jax

    import disprcnn_tpu.ops.points as pts_mod

    k, n = 512, 768
    mask = rng.uniform(size=(4, n)) < 0.8  # ~614 True/row, well past 256
    mask[0] = False  # empty row
    mask[1] = True  # fully dense row
    jmask = jnp.asarray(mask)

    for fake_tpu in (False, True):  # count branch (CPU) / einsum branch
        if fake_tpu:
            monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        idx, cnt = pts_mod.first_k_true(jmask, k)
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        for r in range(mask.shape[0]):
            want = np.nonzero(mask[r])[0]
            wcnt = min(len(want), k)
            assert cnt[r] == wcnt
            np.testing.assert_array_equal(idx[r, :wcnt], want[:wcnt])


def test_fused_pool_kernel_matches_xla(monkeypatch, rng):
    """SharedMLP._fused_pool (Pallas grouped MLP+max, interpret mode on CPU)
    must match the XLA factored+pooled path, with and without BN (eval).
    Channels >= 64 so the kernel gate engages."""
    import jax as _jax

    import disprcnn_tpu.models.pointrcnn.pointnet2 as pn2
    from disprcnn_tpu.models.pointrcnn.pointnet2 import (
        SharedMLP, _fused_group_mlp,
    )

    from disprcnn_tpu.models.pointrcnn.pointnet2 import sample_and_group

    monkeypatch.setattr(pn2, "_FORCE_INTERPRET", True)
    b, n, m, s = 2, 40, 6, 8
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 2.0
    new_xyz = xyz[:, :m]
    feats = jnp.asarray(rng.normal(size=(b, n, 16)).astype(np.float32))
    for use_bn in (False, True):
        mlp = SharedMLP((64, 72), use_bn=use_bn, dtype=jnp.bfloat16)
        args = (xyz, feats, new_xyz, 1.5, s, True, use_bn, False)
        v = mlp.init(
            _jax.random.PRNGKey(0),
            jnp.zeros((b, m, s, 19), jnp.float32), False,
        )
        if use_bn:  # non-trivial folded stats
            v = dict(v)
            v["batch_stats"] = _jax.tree.map(
                lambda a: a + 0.3 * jnp.abs(jnp.asarray(
                    rng.normal(size=a.shape), a.dtype)),
                v["batch_stats"])
        # literal grouped path (never takes the kernel) as the oracle
        g = sample_and_group(xyz, feats, new_xyz, 1.5, s, True)
        want = jnp.max(mlp.apply(v, g, False), axis=2)
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        got = _fused_group_mlp(mlp.bind(v), *args)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,  # bf16 kernel vs bf16-module XLA path
        )


def test_roipool3d_hilo_gather_matches_f32(rng):
    """The fused bf16 hi/lo one-hot gather (TPU path of roipool3d) must
    reproduce the exact f32 row gather to ~2^-16 relative (hi/lo recombine)."""
    from disprcnn_tpu.ops.roipool3d import _gather_onehot_hilo

    pts = rng.uniform(-70, 70, (2, 40, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 40, 5)).astype(np.float32)
    idx = rng.integers(0, 40, (2, 3, 16)).astype(np.int32)
    got = np.asarray(_gather_onehot_hilo(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(idx)))
    full = np.concatenate([pts, feats], axis=-1)
    want = np.stack([full[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_ball_query_einsum_branch_matches(monkeypatch, rng):
    """The MXU one-hot selection branch (TPU-only by default) must agree with
    the count branch and the oracle."""
    import jax as _jax

    import disprcnn_tpu.ops.points as pts_mod

    centers = rng.normal(size=(2, 24, 3)).astype(np.float32)
    pts = rng.normal(size=(2, 40, 3)).astype(np.float32)
    want = pts_mod.ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.9, 8)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    # fresh trace (jit caches by args, not by the monkeypatched branch):
    got = pts_mod.ball_query.__wrapped__(
        jnp.asarray(centers), jnp.asarray(pts), 0.9, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_group_mlp_matches_literal(rng):
    """The factored SharedMLP path (mlp0 feature columns at N points + fused
    one-hot gather) must match the literal grouped path to f32 roundoff,
    with and without BN (eval), features, and use_xyz."""
    import jax

    from disprcnn_tpu.models.pointrcnn.pointnet2 import (
        SharedMLP, _fused_group_mlp, sample_and_group,
    )

    b, n, m, s = 2, 40, 6, 8
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 2.0
    new_xyz = xyz[:, :m]
    for use_bn in (False, True):
        for c in (None, 16):
            feats = (
                None if c is None
                else jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
            )
            mlp = SharedMLP((16, 24), use_bn=use_bn)
            g = sample_and_group(xyz, feats, new_xyz, 1.5, s, True)
            v = mlp.init(jax.random.PRNGKey(0), g, False)
            want = jnp.max(mlp.apply(v, g, False), axis=2)  # pooled
            got = _fused_group_mlp(
                mlp.bind(v), xyz, feats, new_xyz, 1.5, s, True, use_bn, False
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
            )


def test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng):
    """The whole-scale SA mega-kernel (ball query + gathers + MLP + max,
    interpret mode on CPU) must match the literal grouped path, with and
    without BN, including EMPTY balls (-> point 0) and PARTIAL balls
    (first-neighbour fill)."""
    import jax as _jax

    import disprcnn_tpu.models.pointrcnn.pointnet2 as pn2
    from disprcnn_tpu.models.pointrcnn.pointnet2 import (
        SharedMLP, _fused_group_mlp, sample_and_group,
    )

    monkeypatch.setattr(pn2, "_FORCE_INTERPRET", True)
    b, n, m, s = 2, 40, 8, 8
    xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 2.0
    # one far-away center per image -> empty ball; small radius -> partials
    new_xyz = jnp.concatenate(
        [xyz[:, : m - 1], jnp.full((b, 1, 3), 50.0)], axis=1)
    feats = jnp.asarray(rng.normal(size=(b, n, 16)).astype(np.float32))
    radius = 1.2
    for use_bn in (False, True):
        mlp = SharedMLP((64, 72), use_bn=use_bn, dtype=jnp.bfloat16)
        v = mlp.init(
            _jax.random.PRNGKey(0),
            jnp.zeros((b, m, s, 19), jnp.float32), False,
        )
        if use_bn:
            v = dict(v)
            v["batch_stats"] = _jax.tree.map(
                lambda a: a + 0.3 * jnp.abs(jnp.asarray(
                    rng.normal(size=a.shape), a.dtype)),
                v["batch_stats"])
        # oracle 1: the factored XLA path (what the kernel replaces on TPU;
        # identical arithmetic split incl. the empty-ball far-center rows)
        monkeypatch.setattr(pn2, "_FORCE_INTERPRET", False)
        want_f = _fused_group_mlp(
            mlp.bind(v), xyz, feats, new_xyz, radius, s, True, use_bn, False)
        # oracle 2: the literal grouped path — bounded-offset rows only (the
        # degenerate empty-ball center differs between literal and factored
        # mlp0 splits by bf16 cancellation, kernel-independently)
        g = sample_and_group(xyz, feats, new_xyz, radius, s, True)
        want_l = jnp.max(mlp.apply(v, g, False), axis=2)

        monkeypatch.setattr(pn2, "_FORCE_INTERPRET", True)
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        got = _fused_group_mlp(
            mlp.bind(v), xyz, feats, new_xyz, radius, s, True, use_bn, False)
        monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
        # 4e-2: the kernel folds BN into affines once; flax BatchNorm
        # normalizes per call — one bf16 rounding difference amplified
        # through relu + 2 layers (observed worst case 3.1% on 1/1152)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want_f, np.float32),
            rtol=4e-2, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[:, : m - 1],
            np.asarray(want_l, np.float32)[:, : m - 1],
            rtol=4e-2, atol=2e-2)


def test_fused_ball_pool_kernel_variants(monkeypatch, rng):
    """The r4 SA mega-kernel variants (ranks via in-kernel cumsum instead
    of the tri matmul; v gather contracted over N without the XLA-side
    transpose) must be bit-identical to the default kernel config — both
    change only HOW exact integer ranks / exact one-hot selections are
    computed."""
    monkeypatch.setenv("DISPRCNN_SA_XFOLD", "0")  # fold_v needs (N, C0) v
    monkeypatch.setenv("DISPRCNN_SA_RANKS", "cumsum")
    monkeypatch.setenv("DISPRCNN_SA_VT", "fold")
    test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng)


def test_fused_ball_pool_kernel_legacy_tri_twodot(monkeypatch, rng):
    """The pre-r4h default (two selection dots, tri-matmul ranks) stays
    covered now that the shipped default is xfold+cumsum."""
    monkeypatch.setenv("DISPRCNN_SA_XFOLD", "0")
    monkeypatch.setenv("DISPRCNN_SA_RANKS", "tri")
    test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng)


def test_fused_ball_pool_kernel_rows_batched(monkeypatch, rng):
    """DISPRCNN_SA_ROWS=3 (multiple ROIs per grid step) is a pure
    grid-shape change — outputs must be bit-identical to rows=1."""
    monkeypatch.setenv("DISPRCNN_SA_ROWS", "3")
    test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng)


def test_fused_ball_pool_kernel_xfold(monkeypatch, rng):
    """DISPRCNN_SA_XFOLD=1 (xyz hi/mid/lo rows folded into the feature
    operand, one selection dot) — dot rows are independent, so outputs
    must be bit-identical to the two-dot default."""
    monkeypatch.setenv("DISPRCNN_SA_XFOLD", "1")
    test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng)


def test_fused_ball_pool_kernel_xfold_cumsum(monkeypatch, rng):
    monkeypatch.setenv("DISPRCNN_SA_XFOLD", "1")
    monkeypatch.setenv("DISPRCNN_SA_RANKS", "cumsum")
    monkeypatch.setenv("DISPRCNN_SA_ROWS", "2")
    test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng)


def test_fused_ball_pool_kernel_vsep(monkeypatch, rng):
    """DISPRCNN_SA_VSEP=1: xfold's (C0+9, N) operand concatenated in VMEM
    from separate vT/xyz3T inputs instead of one XLA-side HBM concat —
    the kernel sees the identical operand, outputs bit-identical."""
    monkeypatch.setenv("DISPRCNN_SA_XFOLD", "1")
    monkeypatch.setenv("DISPRCNN_SA_VSEP", "1")
    test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng)


def test_fused_ball_pool_kernel_lanes_shared_geometry(monkeypatch, rng):
    """DISPRCNN_SA_GATHER=lanes through the full SharedMLP factored path
    at the shared test's awkward geometry (n=40 needs lane padding,
    m=8 -> mt=8 with 16-slot packs) — the lanes kernel has no geometry
    fall-through, so this exercises pad + pack-duplicate handling."""
    monkeypatch.setenv("DISPRCNN_SA_GATHER", "lanes")
    test_fused_ball_pool_kernel_matches_xla(monkeypatch, rng)


def test_fused_ball_pool_kernel_bisect(monkeypatch, rng):
    """DISPRCNN_SA_GATHER=bisect/onehot-gather/lanes vs the default kernel
    at a geometry where the (mt*s) % n tiling holds (the shared test's
    n=40 has none and silently falls through to the default path):
    bit-identical across variants and rows, incl. empty balls (far
    center), partial balls (tiny radius), and non-power-of-2 n (bisection
    guard). Each arm ASSERTS the intended variant kernel actually ran —
    the r4 version of this test compared the default kernel against
    itself through a broken env gate (ADVICE r4)."""
    from disprcnn_tpu.ops.pallas import sa_fused

    ran = []

    def _track(name, fn):
        def wrapped(*a, **k):
            ran.append(name)
            return fn(*a, **k)
        return wrapped

    monkeypatch.setattr(
        sa_fused, "_sa_ball_mlp_max_b",
        _track("bisect", sa_fused._sa_ball_mlp_max_b))
    monkeypatch.setattr(
        sa_fused, "_sa_ball_mlp_max_g",
        _track("onehot", sa_fused._sa_ball_mlp_max_g))
    monkeypatch.setattr(
        sa_fused, "_sa_ball_mlp_max_l",
        _track("lanes", sa_fused._sa_ball_mlp_max_l))
    # the jit caches traces per (shape, static-config) key; a prior trace
    # of the same config+shape would skip the wrapped python call and the
    # ran-assertion would false-negative
    sa_fused._sa_ball_mlp_max_jit.clear_cache()

    for n, m in ((64, 16), (48, 24)):  # pow2 and non-pow2 source counts
        b, s, c0 = 4, 8, 64
        # the (mt*s) % n tiling must hold or the bisect/onehot variants
        # silently fall through to the default kernel
        assert (min(128, m) * s) % n == 0, (n, m)
        xyz = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 2
        centers = jnp.concatenate(
            [xyz[:, : m - 1], jnp.full((b, 1, 3), 50.0)], axis=1)
        v = jnp.asarray(rng.normal(size=(b, n, c0)).astype(np.float32))
        w0x = jnp.asarray(rng.normal(size=(3, c0)).astype(np.float32)) * 0.1
        mul0 = jnp.ones((c0,), jnp.float32)
        add0 = jnp.zeros((c0,), jnp.float32)
        ws = tuple(
            (jnp.asarray(rng.normal(size=(c0, c0)).astype(np.float32)) * 0.1,
             jnp.zeros((c0,), jnp.float32))
            for _ in range(2))
        args = (xyz, centers, v, w0x, mul0, add0, ws, 1.2, s)
        monkeypatch.delenv("DISPRCNN_SA_GATHER", raising=False)
        want = sa_fused.sa_ball_mlp_max(*args, interpret=True)
        for mode, rows, extra in (
                ("bisect", 1, {}), ("bisect", 2, {}), ("onehot", 1, {}),
                ("lanes", 1, {}), ("lanes", 2, {}),
                # bf16-table/i16-index gather width (halves gather vregs)
                ("lanes", 1, {"DISPRCNN_SA_LG16": "1"}),
                # lane-oriented binary-search slot indices
                ("lanes", 1, {"DISPRCNN_SA_LSEARCH": "bisect"}),
                ("lanes", 2, {"DISPRCNN_SA_LSEARCH": "bisect",
                              "DISPRCNN_SA_LG16": "1"})):
            monkeypatch.setenv("DISPRCNN_SA_GATHER", mode)
            monkeypatch.setenv("DISPRCNN_SA_ROWS", str(rows))
            for ek, ev in extra.items():
                monkeypatch.setenv(ek, ev)
            ran.clear()
            got = sa_fused.sa_ball_mlp_max(*args, interpret=True)
            assert ran == [mode], (
                f"variant {mode} did not dispatch (ran={ran}) — env gate "
                f"or geometry fall-through; the comparison below would be "
                f"vacuous")
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                err_msg=f"mode={mode} rows={rows} n={n}")
            monkeypatch.delenv("DISPRCNN_SA_ROWS", raising=False)
            for ek in extra:
                monkeypatch.delenv(ek, raising=False)


def test_topk_threshold_matches_lax_topk(rng):
    """topk_threshold must be bit-identical to jax.lax.top_k on
    non-negative scores: same values, same indices, same lowest-index tie
    resolution — incl. heavy ties at and above the threshold, zeros, and
    k == n."""
    import jax

    from disprcnn_tpu.ops.topk_select import topk_threshold

    for b, n, k, quant in ((3, 1000, 64, None), (2, 5000, 600, 0.01),
                           (1, 300, 300, 0.1), (2, 257, 19, 0.5)):
        s = rng.uniform(0.0, 1.0, size=(b, n)).astype(np.float32)
        if quant:  # force many exact ties
            s = (np.round(s / quant) * quant).astype(np.float32)
        s[:, :5] = 0.0
        s = jnp.asarray(s)
        wv, wi = jax.lax.top_k(s, k)
        gv, gi = topk_threshold(s, k)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


def test_roipool3d_fused_matches_xla(rng):
    """roipool3d_fused (Pallas, interpret) vs ops.roipool3d (first-k scan
    order, tail cycling, empty flag), incl. an empty box."""
    from disprcnn_tpu.ops.pallas.roipool3d_fused import roipool3d_fused
    from disprcnn_tpu.ops.roipool3d import roipool3d

    b, n, m, s = 2, 60, 3, 16
    pts = jnp.asarray(rng.uniform(-4, 4, (b, n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(b, n, 5)).astype(np.float32))
    boxes = np.tile(
        np.array([[0.0, 1.0, 0.0, 2.0, 3.0, 3.0, 0.4],
                  [1.0, 0.5, -1.0, 1.5, 2.0, 2.5, -0.8],
                  [50.0, 50.0, 50.0, 1.0, 1.0, 1.0, 0.0]],  # empty
                 np.float32)[None], (b, 1, 1))
    boxes = jnp.asarray(boxes)
    want_p, want_e = roipool3d(pts, feats, boxes, sampled_pts_num=s)
    got_p, got_e = roipool3d_fused(pts, feats, boxes, sampled_pts_num=s,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got_e), np.asarray(want_e))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
    # m=8 engages the multi-box grid steps (rboxes > 1)
    boxes8 = jnp.concatenate([boxes, boxes + jnp.asarray(
        [0.5, 0, -0.5, 0, 0, 0, 0.2]), boxes[:, :2] * 0.5], axis=1)
    want_p, want_e = roipool3d(pts, feats, boxes8, sampled_pts_num=s)
    got_p, got_e = roipool3d_fused(pts, feats, boxes8, sampled_pts_num=s,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got_e), np.asarray(want_e))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-5)
    # r5 bf16-fold gather: channels declared bf16-exact ride the dot as
    # single rows; declared-f32 channels get the hi/mid/lo 3-split. With
    # channels 0/2/4 actually holding bf16-exact values the result must be
    # BIT-identical to the all-split default (both reconstruct exactly).
    feats_mix = feats.at[:, :, 0].set(
        feats[:, :, 0].astype(jnp.bfloat16).astype(jnp.float32))
    feats_mix = feats_mix.at[:, :, 2].set(
        (feats[:, :, 2] > 0).astype(jnp.float32))
    feats_mix = feats_mix.at[:, :, 4].set(
        feats[:, :, 4].astype(jnp.bfloat16).astype(jnp.float32))
    all_p, all_e = roipool3d_fused(pts, feats_mix, boxes8, sampled_pts_num=s,
                                   interpret=True)
    mix_p, mix_e = roipool3d_fused(pts, feats_mix, boxes8, sampled_pts_num=s,
                                   interpret=True, f32_channels=(1, 3))
    np.testing.assert_array_equal(np.asarray(mix_e), np.asarray(all_e))
    np.testing.assert_array_equal(np.asarray(mix_p), np.asarray(all_p))


def test_fp_fused_matches_xla(monkeypatch, rng):
    """FPModule's fused 3-NN + interpolate + MLP kernel (interpret mode)
    vs the literal XLA path, with and without BN."""
    import jax as _jax

    import disprcnn_tpu.models.pointrcnn.pointnet2 as pn2
    from disprcnn_tpu.models.pointrcnn.pointnet2 import FPModule

    b, nt, ns = 2, 24, 10
    unknown = jnp.asarray(rng.normal(size=(b, nt, 3)).astype(np.float32)) * 2
    known = jnp.asarray(rng.normal(size=(b, ns, 3)).astype(np.float32)) * 2
    kf = jnp.asarray(rng.normal(size=(b, ns, 8)).astype(np.float32))
    uf = jnp.asarray(rng.normal(size=(b, nt, 6)).astype(np.float32))
    for use_bn in (False, True):
        mod = FPModule((16, 12), use_bn=use_bn, dtype=jnp.bfloat16)
        v = mod.init(_jax.random.PRNGKey(0), unknown, known, uf, kf, False)
        if use_bn:
            v = dict(v)
            v["batch_stats"] = _jax.tree.map(
                lambda a: a + 0.3 * jnp.abs(jnp.asarray(
                    rng.normal(size=a.shape), a.dtype)),
                v["batch_stats"])
        want = mod.apply(v, unknown, known, uf, kf, False)
        monkeypatch.setattr(pn2, "_FORCE_INTERPRET", True)
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        got = mod.apply(v, unknown, known, uf, kf, False)
        monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
        monkeypatch.setattr(pn2, "_FORCE_INTERPRET", False)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=4e-2, atol=2e-2)


def test_roi_align_regular_matches_flat(rng):
    """The rois_per_image (batch-LINEAR per-image contraction) path must be
    bit-compatible with the flat (B*H)-axis path it replaces — the flat
    form's dot flops grow as B^2 (round-3 batch-superlinear bench term)."""
    from disprcnn_tpu.ops.roi_align import roi_align_batched

    b, h, w, c, k = 3, 12, 9, 5, 4
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(0, 8, (b * k, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 1.0 + boxes[:, 2:])
    bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    for pooled, s, scale in ((4, 2, 1.0), (3, 1, 0.5)):
        flat = roi_align_batched(feat, boxes, bi, pooled, scale, s)
        reg = roi_align_batched(feat, boxes, bi, pooled, scale, s,
                                rois_per_image=k)
        np.testing.assert_allclose(np.asarray(reg), np.asarray(flat),
                                   rtol=1e-5, atol=1e-6)
    # tall map exercises the other contraction order (h > w)
    feat2 = jnp.asarray(rng.normal(size=(b, 9, 12, c)).astype(np.float32))
    flat = roi_align_batched(feat2, boxes, bi, 4, 1.0, 2)
    reg = roi_align_batched(feat2, boxes, bi, 4, 1.0, 2, rois_per_image=k)
    np.testing.assert_allclose(np.asarray(reg), np.asarray(flat),
                               rtol=1e-5, atol=1e-6)
