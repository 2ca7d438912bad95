import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model XLA CPU compiles (>1 min each)

from disprcnn_tpu.models.detector.disprcnn import DispRCNN
from disprcnn_tpu.models.rpn import box_coder
from disprcnn_tpu.models.rpn.anchors import AnchorGenerator, cell_anchors
from disprcnn_tpu.models.rpn.matcher import balanced_sample, match


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    model = DispRCNN(
        body="R-50", pre_nms_top_n_train=200, post_nms_top_n_train=64,
        pre_nms_top_n_test=200, post_nms_top_n_test=48, roi_batch_per_image=32,
        max_det=8, max_gt=4, detections_per_img=8,
    )
    rng = jax.random.PRNGKey(0)
    left = jnp.zeros((1, 128, 256, 3))
    vars_ = model.init({"params": rng, "sampling": rng}, left, left, train=False)
    return model, vars_


def test_cell_anchors_reference_values():
    # stride 16, size 128, ratios (0.5, 1, 2): classic Faster R-CNN table values
    a = cell_anchors(16, (128,), (0.5, 1.0, 2.0))
    assert a.shape == (3, 4)
    w = a[:, 2] - a[:, 0] + 1
    h = a[:, 3] - a[:, 1] + 1
    # ratio 0.5 -> wider than tall; areas approx 128^2
    assert w[0] > h[0] and abs(w[1] - h[1]) < 1e-3 and w[2] < h[2]
    np.testing.assert_allclose((w * h)[1], 128 * 128, rtol=0.1)
    # all share the same center
    cx = (a[:, 0] + a[:, 2]) / 2
    np.testing.assert_allclose(cx, cx[0], atol=0.51)


def test_anchor_generator_counts_and_visibility():
    gen = AnchorGenerator(sizes=(32, 64), strides=(4, 8), ratios=(0.5, 1.0, 2.0))
    anchors, vis = gen((64, 128), [(16, 32), (8, 16)])
    assert anchors.shape == ((16 * 32 + 8 * 16) * 3, 4)
    assert vis.dtype == bool and vis.sum() > 0 and (~vis).sum() > 0


def test_box_coder_roundtrip(rng):
    boxes = jnp.asarray(rng.uniform(0, 100, (10, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 10 + boxes[:, 2:] % 40)
    ref6 = jnp.concatenate([boxes + 3.0, boxes[:, 0:1] - 7.0, boxes[:, 2:3] - 7.0], -1)
    deltas = box_coder.encode6(ref6, boxes)
    back = box_coder.decode6(deltas, boxes)
    # the reference decode drops the "-1" correction (box_coder.py:183-233), so
    # an exact roundtrip yields x2/y2/x2' + 1 — we reproduce that quirk.
    quirk = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref6 + quirk), rtol=1e-4, atol=1e-3
    )
    # stereo split/join roundtrip
    l, r = box_coder.split_stereo(ref6)
    np.testing.assert_allclose(np.asarray(box_coder.join_stereo(l, r)), np.asarray(ref6))


def test_box_coder_roundtrip_from_anchor4(rng):
    anchors = jnp.asarray([[0.0, 0, 50, 60], [10, 10, 90, 40]])
    ref6 = jnp.asarray([[5.0, 2, 45, 55, 1, 41], [12, 8, 88, 44, 2, 78]])
    back = box_coder.decode6(box_coder.encode6(ref6, anchors), anchors)
    quirk = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref6 + quirk), rtol=1e-4, atol=1e-3
    )


def test_matcher_codes_and_low_quality():
    # 2 gt, 4 anchors; anchor0 high IoU with gt0, anchor1 mid, anchor2 low,
    # anchor3 is gt1's best (low absolute IoU) -> recovered as match
    q = jnp.asarray([
        [0.9, 0.5, 0.1, 0.0],
        [0.0, 0.0, 0.05, 0.25],
    ])
    m = np.asarray(match(q, jnp.asarray([True, True]), 0.7, 0.3))
    assert m[0] == 0  # above high
    assert m[1] == -2  # between
    assert m[3] == 1  # low-quality recovery
    m2 = np.asarray(match(q, jnp.asarray([True, False]), 0.7, 0.3))
    assert m2[3] == -1  # gt1 invalid -> below low


def test_balanced_sampler_counts():
    labels = jnp.asarray([1.0] * 10 + [0.0] * 100 + [-1.0] * 20)
    pos, neg = balanced_sample(jax.random.PRNGKey(0), labels, 32, 0.5)
    assert int(pos.sum()) == 10  # fewer positives than cap
    assert int(neg.sum()) == 22  # fills the rest
    assert not bool((pos & (labels != 1)).any())
    assert not bool((neg & (labels != 0)).any())


def test_detector_inference_shapes(tiny_model_and_vars):
    model, vars_ = tiny_model_and_vars
    left = jnp.zeros((1, 128, 256, 3))
    out = model.apply(vars_, left, left, train=False)
    dets = out["detections"]
    assert dets.left.shape == (1, 8, 4)
    assert dets.right.shape == (1, 8, 4)
    assert out["masks"].shape == (1, 8, 28, 28)
    # right view shares y extents with left
    np.testing.assert_allclose(
        np.asarray(dets.left[..., 1]), np.asarray(dets.right[..., 1])
    )


def test_detector_train_losses_finite_and_differentiable(tiny_model_and_vars):
    model, vars_ = tiny_model_and_vars
    B, H, W = 1, 128, 256
    left = jnp.full((B, H, W, 3), 0.1)
    gt_left = jnp.asarray([[[10.0, 20, 60, 70], [100, 30, 150, 90], [0, 0, 0, 0], [0, 0, 0, 0]]])
    gt_right = gt_left - jnp.asarray([5.0, 0, 5, 0])
    gt = dict(
        gt_left=gt_left, gt_right=gt_right,
        gt_labels=jnp.ones((B, 4), jnp.int32),
        gt_valid=jnp.asarray([[True, True, False, False]]),
        gt_masks=jnp.ones((B, 4, H, W)) * 0.7,
    )
    rngs = {"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}

    def loss_fn(params):
        out = model.apply(
            {"params": params, "frozen": vars_["frozen"]},
            left, left, train=True, **gt, rngs=rngs,
        )
        return sum(v for k, v in out.items() if k.startswith("loss"))

    loss, grads = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the RPN head must receive gradient
    g_rpn = jax.tree.leaves(grads["rpn_head"])
    assert sum(float(jnp.abs(g).sum()) for g in g_rpn) > 0


def test_box_postprocess_batched_matches_per_image(rng):
    """postprocess_batched must reproduce vmap(postprocess) per image (it
    replaces it for speed: the vmapped form's gathers lower to ~5x-slower
    generic batched gathers — profile_2d measured 2.47 ms at P=300)."""
    import jax
    import jax.numpy as jnp

    from disprcnn_tpu.models.roi_heads import box_head as bh
    from disprcnn_tpu.structures.stereo import StereoBoxes

    b, p, c = 3, 40, 2
    logits = jnp.asarray(rng.normal(size=(b, p, c)).astype(np.float32)) * 2
    deltas = jnp.asarray(rng.normal(size=(b, p, c * 6)).astype(np.float32)) * 0.2
    x1 = rng.uniform(0, 200, (b, p, 2)).astype(np.float32)
    wh = rng.uniform(8, 60, (b, p, 2)).astype(np.float32)
    left = jnp.asarray(np.concatenate([x1, x1 + wh], -1))
    right = jnp.asarray(np.concatenate([x1 - 5, x1 + wh - 3], -1))
    props = StereoBoxes(
        left=left, right=right,
        score=jnp.asarray(rng.uniform(0, 1, (b, p)).astype(np.float32)),
        valid=jnp.asarray(rng.uniform(0, 1, (b, p)) > 0.1),
    )
    hw = (240, 320)
    want = jax.vmap(
        lambda cl, bd, pr: bh.postprocess(cl, bd, pr, hw, 0.05, 0.5, 100, 8)
    )(logits, deltas, props)
    got = bh.postprocess_batched(logits, deltas, props, hw, 0.05, 0.5, 100, 8)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    m = np.asarray(got.valid)[..., None]
    np.testing.assert_allclose(
        np.asarray(got.left) * m, np.asarray(want.left) * m, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got.right) * m, np.asarray(want.right) * m, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got.score) * m[..., 0], np.asarray(want.score) * m[..., 0],
        rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got.fields["labels"]) * m[..., 0].astype(np.int32),
        np.asarray(want.fields["labels"]) * m[..., 0].astype(np.int32))


def test_srpn_head_atlas_matches_per_level(monkeypatch):
    """DISPRCNN_SRPN_ATLAS packs all FPN levels into one zero-gapped
    canvas for the head's convs — a 3x3 window never crosses the 2-row
    gap and gap/pad contributions are exact zero products, so the SAME
    terms are summed; only the conv's internal accumulation order may
    differ with the shape (observed ULP-level deltas on XLA:CPU)."""
    import jax
    import numpy as np

    from disprcnn_tpu.models.rpn.stereo_rpn import SRPNHead

    rng = np.random.default_rng(0)
    head = SRPNHead(in_channels=32, num_anchors=3, dtype=jnp.float32)
    # uneven level shapes incl. a tiny one (pad + gap edge cases)
    shapes = [(12, 40), (6, 20), (3, 10)]
    both = [jnp.asarray(rng.normal(size=(4, h, w, 32)).astype(np.float32))
            for h, w in shapes]
    v = head.init(jax.random.PRNGKey(0), None, None, both_feats=both)
    monkeypatch.delenv("DISPRCNN_SRPN_ATLAS", raising=False)
    want = head.apply(v, None, None, both_feats=both)
    monkeypatch.setenv("DISPRCNN_SRPN_ATLAS", "1")
    got = head.apply(v, None, None, both_feats=both)
    assert len(got) == len(want)
    for (gl, gd), (wl, wd) in zip(got, want):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(wl),
                                   rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                                   rtol=2e-6, atol=2e-6)
