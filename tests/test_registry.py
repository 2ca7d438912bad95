"""Registry reachability: every META_ARCHITECTURE / CONV_BODY family the
reference ships must be constructible from cfg and run a forward pass.

Reference dispatch surface: modeling/rpn/rpn.py:201-209 (RPN vs RetinaNet),
modeling/detector/detectors.py, modeling/backbone/backbone.py registry
(R-x-C4/C5, R-x-FPN, FBNet). The shipped YAMLs only exercise stereo
R-101-FPN; the rest is registry parity (VERDICT round 1, item 9).
"""
import jax
import jax.numpy as jnp
import pytest

from disprcnn_tpu.config import get_default_cfg
from disprcnn_tpu.models.build import build_detection_model


def _tiny_common(cfg):
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 32
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_DETECTIONS = 4
    cfg.TEST.DETECTIONS_PER_IMG = 4
    return cfg


@pytest.mark.slow
def test_mono_generalized_rcnn_fpn_eval():
    cfg = _tiny_common(get_default_cfg())
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.STEREO_ON = False
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    model = build_detection_model(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "sampling": rng}, img, train=False)
    out = model.apply(v, img, train=False)
    dets = out["detections"]
    assert dets.xyxy.shape == (1, 4, 4)


@pytest.mark.slow
def test_mono_generalized_rcnn_c4_eval():
    cfg = _tiny_common(get_default_cfg())
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.STEREO_ON = False
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C4"  # the GeneralizedRCNN default body
    model = build_detection_model(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "sampling": rng}, img, train=False)
    out = model.apply(v, img, train=False)
    assert out["detections"].xyxy.shape == (1, 4, 4)
    # C4 head: res5 params exist, no FPN params
    assert "box_head" in v["params"]
    assert "fpn" not in v["params"].get("backbone", {})


@pytest.mark.slow
def test_mono_generalized_rcnn_c4_train_losses():
    cfg = _tiny_common(get_default_cfg())
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.STEREO_ON = False
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C4"
    model = build_detection_model(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    gt = jnp.asarray([[[8.0, 8, 40, 40], [20.0, 10, 60, 50]]])
    gl = jnp.asarray([[1, 2]], jnp.int32)
    gv = jnp.asarray([[True, True]])
    rng = jax.random.PRNGKey(0)
    v = model.init(
        {"params": rng, "sampling": rng}, img, train=True,
        gt_boxes=gt, gt_labels=gl, gt_valid=gv,
    )
    out = model.apply(
        v, img, train=True, gt_boxes=gt, gt_labels=gl, gt_valid=gv,
        rngs={"sampling": rng},
    )
    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg"):
        assert k in out and jnp.isfinite(out[k])


@pytest.mark.slow
def test_retinanet_eval_and_train():
    cfg = _tiny_common(get_default_cfg())
    cfg.MODEL.RETINANET_ON = True
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.RETINANET.PRE_NMS_TOP_N = 32
    cfg.TEST.DETECTIONS_PER_IMG = 4
    model = build_detection_model(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "sampling": rng}, img, train=False)
    out = model.apply(v, img, train=False)
    assert out["detections"].xyxy.shape == (1, 4, 4)
    # P6/P7 exist
    assert "p6_s2" in v["params"]["backbone"]["fpn"]
    gt = jnp.asarray([[[8.0, 8, 40, 40]]])
    gl = jnp.asarray([[1]], jnp.int32)
    gv = jnp.asarray([[True]])
    losses = model.apply(
        v, img, train=True, gt_boxes=gt, gt_labels=gl, gt_valid=gv,
        rngs={"sampling": rng},
    )
    assert jnp.isfinite(losses["loss_retina_cls"])
    assert jnp.isfinite(losses["loss_retina_reg"])


@pytest.mark.slow
def test_gn_options_build():
    """USE_GN swaps FrozenBN for GroupNorm in body and FPN."""
    cfg = _tiny_common(get_default_cfg())
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.STEREO_ON = False
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.BACKBONE.USE_GN = True
    model = build_detection_model(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "sampling": rng}, img, train=False)
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = "".join(str(p) for p, _ in flat)
    assert "GroupNorm" in names


@pytest.mark.slow
def test_stereo_disprcnn_gn_build():
    cfg = _tiny_common(get_default_cfg())
    cfg.MODEL.META_ARCHITECTURE = "DispRCNN"
    cfg.MODEL.STEREO_ON = True
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.DISPNET_ON = False
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.FPN.USE_GN = True
    model = build_detection_model(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "sampling": rng}, img, img, train=False)
    assert "fpn" in v["params"]["backbone"]
