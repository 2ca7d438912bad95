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
