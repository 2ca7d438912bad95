import numpy as np
import pytest

torch = pytest.importorskip("torch")

from disprcnn_tpu.utils.torch_import import (
    convert_state_dict,
    load_torch_state_dict,
    remap_disprcnn2d_names,
    split_params_frozen,
    to_tree,
)


def test_conv_linear_bn_conversion(tmp_path, rng):
    sd = {
        "backbone.body.stem.conv1.weight": torch.randn(64, 3, 7, 7),
        "backbone.body.stem.bn1.weight": torch.randn(64),
        "backbone.body.stem.bn1.bias": torch.randn(64),
        "backbone.body.stem.bn1.running_mean": torch.randn(64),
        "backbone.body.stem.bn1.running_var": torch.rand(64) + 0.5,
        "roi_heads.box.predictor.cls_score.weight": torch.randn(2, 2048),
        "roi_heads.box.predictor.cls_score.bias": torch.randn(2),
    }
    path = tmp_path / "m.pth"
    torch.save({"model": sd}, str(path))
    flat = load_torch_state_dict(str(path))
    conv = convert_state_dict(flat)
    remapped = remap_disprcnn2d_names(conv)
    params, frozen = split_params_frozen(to_tree(remapped))

    k = params["backbone"]["body"]["stem"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        k[0, 0, 0], sd["backbone.body.stem.conv1.weight"].numpy()[:, 0, 0, 0]
    )
    bn = frozen["backbone"]["body"]["stem"]["FrozenBatchNorm_0"]
    assert set(bn.keys()) == {"scale", "bias", "mean", "var"}
    fc = params["box_predictor"]["cls_score"]["kernel"]
    assert fc.shape == (2048, 2)


@pytest.mark.slow
def test_import_into_model_matches_shapes():
    """Converted stem/FPN keys must match the flax DispRCNN param tree shapes."""
    import jax
    import jax.numpy as jnp

    from disprcnn_tpu.models.detector.disprcnn import DispRCNN

    model = DispRCNN(body="R-50", max_det=4, max_gt=4, post_nms_top_n_test=16,
                     pre_nms_top_n_test=64)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init({"params": rng, "sampling": rng}, x, x, train=False)

    sd = {
        "backbone.body.stem.conv1.weight": torch.randn(64, 3, 7, 7),
        "backbone.fpn.fpn_inner1.weight": torch.randn(256, 256, 1, 1),
        "backbone.fpn.fpn_inner1.bias": torch.randn(256),
        "rpn.head.conv.weight": torch.randn(512, 256, 3, 3),
        "rpn.head.conv.bias": torch.randn(512),
        "backbone.body.layer1.0.conv1.weight": torch.randn(64, 64, 1, 1),
        "backbone.body.layer1.0.downsample.0.weight": torch.randn(256, 64, 1, 1),
    }
    conv = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    remapped = remap_disprcnn2d_names(conv)
    params, _ = split_params_frozen(to_tree(remapped))

    tgt = variables["params"]
    assert (
        params["backbone"]["body"]["stem"]["conv1"]["kernel"].shape
        == tgt["backbone"]["body"]["stem"]["conv1"]["kernel"].shape
    )
    assert (
        params["backbone"]["fpn"]["lateral2"]["kernel"].shape
        == tgt["backbone"]["fpn"]["lateral2"]["kernel"].shape
    )
    assert (
        params["rpn_head"]["conv"]["kernel"].shape
        == tgt["rpn_head"]["conv"]["kernel"].shape
    )
    assert (
        params["backbone"]["body"]["layer1_0"]["conv1"]["kernel"].shape
        == tgt["backbone"]["body"]["layer1_0"]["conv1"]["kernel"].shape
    )
    assert (
        params["backbone"]["body"]["layer1_0"]["downsample_conv"]["kernel"].shape
        == tgt["backbone"]["body"]["layer1_0"]["downsample_conv"]["kernel"].shape
    )


def test_c2_pickle_import(tmp_path):
    """Synthetic Detectron/Caffe2 blob pickle (caffe2 names, affine BN, OIHW
    convs) imports into the frozen/params split with correct layouts
    (reference c2_model_loading.py:12-175 rename chain)."""
    import pickle

    from disprcnn_tpu.utils.checkpoint import load_stage_weights, resolve_weight
    from disprcnn_tpu.utils.torch_import import import_c2_backbone, rename_c2_resnet_key

    rng = np.random.default_rng(0)
    blobs = {
        "conv1_w": rng.normal(size=(64, 3, 7, 7)).astype(np.float32),
        "res_conv1_bn_s": rng.normal(size=(64,)).astype(np.float32),
        "res_conv1_bn_b": rng.normal(size=(64,)).astype(np.float32),
        "res2_0_branch2a_w": rng.normal(size=(64, 64, 1, 1)).astype(np.float32),
        "res2_0_branch2a_bn_s": rng.normal(size=(64,)).astype(np.float32),
        "res2_0_branch2a_bn_b": rng.normal(size=(64,)).astype(np.float32),
        "res2_0_branch1_w": rng.normal(size=(256, 64, 1, 1)).astype(np.float32),
        "res2_0_branch1_bn_s": rng.normal(size=(256,)).astype(np.float32),
        "res2_0_branch1_bn_b": rng.normal(size=(256,)).astype(np.float32),
        "res2_0_branch2a_bn_riv": rng.normal(size=(64,)).astype(np.float32),
        "pred_w": rng.normal(size=(1000, 2048)).astype(np.float32),  # dropped
    }
    p = tmp_path / "R-50.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    assert rename_c2_resnet_key("res3_4_branch2b_w") == \
        "backbone.body.layer2.4.conv2.weight"
    assert rename_c2_resnet_key("res5_2_branch1_bn_s") == \
        "backbone.body.layer4.2.downsample.1.weight"
    assert rename_c2_resnet_key("fc1000_w") is None

    params, frozen = import_c2_backbone(str(p))
    stem = frozen["backbone"]["body"]["stem"]["FrozenBatchNorm_0"]
    np.testing.assert_array_equal(stem["scale"], blobs["res_conv1_bn_s"])
    np.testing.assert_array_equal(stem["mean"], np.zeros(64))
    np.testing.assert_array_equal(stem["var"], np.ones(64))
    conv1 = params["backbone"]["body"]["stem"]["conv1"]["kernel"]
    assert conv1.shape == (7, 7, 3, 64)  # OIHW -> HWIO
    # downsample norm is created FIRST in our Bottleneck -> _0
    ds = frozen["backbone"]["body"]["layer1_0"]["FrozenBatchNorm_0"]
    np.testing.assert_array_equal(ds["scale"], blobs["res2_0_branch1_bn_s"])

    # catalog:// resolution contract
    import os

    os.environ["DISPRCNN_WEIGHTS"] = str(tmp_path)
    try:
        assert resolve_weight("catalog://ImageNetPretrained/MSRA/R-50") == str(p)
        with pytest.raises(FileNotFoundError):
            resolve_weight("catalog://ImageNetPretrained/MSRA/R-101")
    finally:
        del os.environ["DISPRCNN_WEIGHTS"]
