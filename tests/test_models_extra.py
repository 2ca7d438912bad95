import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model XLA CPU compiles (>1 min each)

from disprcnn_tpu.models.detector.generalized_rcnn import GeneralizedRCNN
from disprcnn_tpu.models.psmnet.dispmodule import DispModule, expand_left_right_freex, roi_resolution_keep
from disprcnn_tpu.models.psmnet.inference import rois_to_fullimage_disparity
from disprcnn_tpu.models.rpn.retinanet import (
    RetinaNetHead,
    octave_anchor_generator,
    retinanet_loss,
    retinanet_postprocess,
)


def test_expand_left_right_freex():
    left = jnp.asarray([[10.0, 5, 50, 40]])
    right = jnp.asarray([[4.0, 5, 60, 40]])
    le, re = expand_left_right_freex(left, right, 100.0)
    assert float(le[0, 2] - le[0, 0]) == 56.0
    assert float(re[0, 2] - re[0, 0]) == 56.0
    # clamp at image border
    le2, _ = expand_left_right_freex(jnp.asarray([[90.0, 5, 95, 40]]),
                                     jnp.asarray([[0.0, 5, 60, 40]]), 100.0)
    assert float(le2[0, 2]) <= 100.0


def test_roi_resolution_keep_partition():
    boxes = jnp.asarray(
        [[0, 0, 30, 30], [0, 0, 100, 100], [0, 0, 300, 300]], jnp.float32
    )
    k14 = np.asarray(roi_resolution_keep(boxes, (14, 28), 14))
    k28 = np.asarray(roi_resolution_keep(boxes, (14, 28), 28))
    assert (k14 ^ k28).all()  # exact partition


def test_dispmodule_shapes():
    model = DispModule(maxdisp=8, mindisp=-8, resolution=16, disp_resolution=64)
    feats = [jnp.zeros((1, 32 // (2 ** i), 64 // (2 ** i), 16)) for i in range(4)]
    boxes = jnp.asarray([[4.0, 4, 40, 28], [10, 2, 60, 30]])
    bi = jnp.zeros(2, jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0)}, feats, feats, boxes, boxes, bi, train=False)
    out = model.apply(v, feats, feats, boxes, boxes, bi, train=False)
    assert out.shape == (2, 64, 64)
    p1, p2, p3 = model.apply(
        v, feats, feats, boxes, boxes, bi, train=True, mutable=["batch_stats"]
    )[0]
    assert p3.shape == (2, 64, 64)


def test_rois_to_fullimage_disparity():
    disp = jnp.full((2, 16, 16), 10.0)
    masks = jnp.ones((2, 8, 8))
    left = jnp.asarray([[10.0, 10, 30, 30], [40.0, 5, 60, 25]])
    right = left - jnp.asarray([4.0, 0, 4, 0])
    out = np.asarray(
        rois_to_fullimage_disparity(
            disp, masks, left, right, jnp.asarray([True, True]), im_h=40, im_w=80
        )
    )
    assert out.shape == (40, 80)
    # inside first box: disparity approx value*scale + x-offset
    assert out[20, 20] > 0
    assert out[0, 0] == 0.0
    # invalid roi contributes nothing
    out2 = np.asarray(
        rois_to_fullimage_disparity(
            disp, masks, left, right, jnp.asarray([True, False]), im_h=40, im_w=80
        )
    )
    assert (out2[6:24, 41:59] == 0).all()


def test_generalized_rcnn_mono():
    model = GeneralizedRCNN(
        body="R-50", num_classes=3, pre_nms_top_n_test=200, post_nms_top_n_test=32,
        pre_nms_top_n_train=200, post_nms_top_n_train=64, roi_batch_per_image=32,
        max_det=8, max_gt=4,
    )
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 128, 256, 3))
    v = model.init({"params": rng, "sampling": rng}, img, train=False)
    out = model.apply(v, img, train=False)
    assert out["detections"].xyxy.shape == (1, 8, 4)
    gt = dict(
        gt_boxes=jnp.asarray([[[10.0, 10, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]]),
        gt_labels=jnp.ones((1, 4), jnp.int32),
        gt_valid=jnp.asarray([[True, False, False, False]]),
    )
    losses = model.apply(
        v, img, train=True, **gt,
        rngs={"sampling": jax.random.PRNGKey(1)},
    )
    assert all(np.isfinite(float(v)) for k, v in losses.items() if k.startswith("loss"))


def test_retinanet_head_and_postprocess():
    gen = octave_anchor_generator(sizes=(32, 64), strides=(8, 16))
    head = RetinaNetHead(num_classes=2, num_anchors=gen.num_anchors_per_location, num_convs=2)
    feats = [jnp.zeros((1, 16, 32, 64)), jnp.zeros((1, 8, 16, 64))]
    v = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(v, feats)
    anchors_np, _ = gen((128, 256), [(16, 32), (8, 16)])
    n_total = sum(o[0].shape[1] for o in outs)
    assert n_total == anchors_np.shape[0]
    cls = jnp.concatenate([o[0] for o in outs], 1)[0]
    box = jnp.concatenate([o[1] for o in outs], 1)[0]
    dets = retinanet_postprocess(jnp.asarray(anchors_np), cls, box, (128, 256), max_det=8)
    assert dets.xyxy.shape == (8, 4)
    # new-layer bias init => prior prob ~0.01 sigmoid scores, none above 0.05
    assert int(dets.valid.sum()) == 0
    gt = jnp.asarray([[[10.0, 10, 60, 60]]])
    cl, bl = retinanet_loss(
        jax.random.PRNGKey(0), jnp.asarray(anchors_np), cls[None], box[None],
        gt, jnp.ones((1, 1), jnp.int32), jnp.asarray([[True]]),
    )
    assert np.isfinite(float(cl)) and np.isfinite(float(bl))
