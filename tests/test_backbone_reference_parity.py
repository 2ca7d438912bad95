"""R-101-FPN backbone activation parity vs the VENDORED REFERENCE torch code
(modeling/backbone/{resnet,fpn}.py), weights transferred through
utils.torch_import (the released-2D-checkpoint import path).

The reference modules are loaded with a shimmed `disprcnn` package (their
`layers` package would pull the unavailable CUDA extension; only
FrozenBatchNorm2d / Conv2d / registry are real). The reference ResNet is
driven by OUR CfgNode — the config trees are key-compatible by design.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/disprcnn"


def _load(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_backbone_mods():
    pkg = types.ModuleType("disprcnn")
    pkg.__path__ = [REF]
    sys.modules["disprcnn"] = pkg
    bn = _load("disprcnn._bn", f"{REF}/layers/batch_norm.py")
    misc = _load("disprcnn._misc", f"{REF}/layers/misc.py")
    layers = types.ModuleType("disprcnn.layers")
    layers.FrozenBatchNorm2d = bn.FrozenBatchNorm2d
    layers.Conv2d = misc.Conv2d
    sys.modules["disprcnn.layers"] = layers
    modeling = types.ModuleType("disprcnn.modeling")
    modeling.__path__ = [f"{REF}/modeling"]
    sys.modules["disprcnn.modeling"] = modeling
    ml = types.ModuleType("disprcnn.modeling.make_layers")
    ml.group_norm = None  # GN paths unused (USE_GN False)
    sys.modules["disprcnn.modeling.make_layers"] = ml
    utils = types.ModuleType("disprcnn.utils")
    utils.__path__ = [f"{REF}/utils"]
    sys.modules["disprcnn.utils"] = utils
    _load("disprcnn.utils.registry", f"{REF}/utils/registry.py")
    bpkg = types.ModuleType("disprcnn.modeling.backbone")
    bpkg.__path__ = [f"{REF}/modeling/backbone"]
    sys.modules["disprcnn.modeling.backbone"] = bpkg
    resnet = _load("disprcnn.modeling.backbone.resnet",
                   f"{REF}/modeling/backbone/resnet.py")
    fpnm = _load("disprcnn.modeling.backbone.fpn",
                 f"{REF}/modeling/backbone/fpn.py")
    return resnet, fpnm


@pytest.mark.slow
def test_r101_fpn_backbone_parity(ref_backbone_mods):
    from disprcnn_tpu.config import get_default_cfg
    from disprcnn_tpu.models.backbone.fpn import ResNetFPNBackbone
    from disprcnn_tpu.utils.torch_import import (
        convert_state_dict, remap_disprcnn2d_names, split_params_frozen, to_tree,
    )

    resnet_mod, fpn_mod = ref_backbone_mods
    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-101-FPN"

    torch.manual_seed(0)
    body = resnet_mod.ResNet(cfg).eval()
    conv_block = lambda cin, cout, k, stride=1, dilation=1: torch.nn.Conv2d(
        cin, cout, k, stride=stride, padding=dilation * (k - 1) // 2,
        dilation=dilation, bias=True)
    fpn = fpn_mod.FPN(
        in_channels_list=[256, 512, 1024, 2048], out_channels=256,
        conv_block=conv_block, top_blocks=fpn_mod.LastLevelMaxPool(),
    ).eval()

    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in list(body.modules()) + list(fpn.modules()):
            if isinstance(m, torch.nn.Conv2d):
                m.weight.mul_(0.25)  # keep untrained activations O(1)
            if m.__class__.__name__ == "FrozenBatchNorm2d":
                m.weight.uniform_(0.6, 1.4, generator=gen)
                m.bias.uniform_(-0.2, 0.2, generator=gen)
                m.running_mean.uniform_(-0.2, 0.2, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)

    sd = {f"backbone.body.{k}": v.detach().numpy()
          for k, v in body.state_dict().items()}
    sd.update({f"backbone.fpn.{k}": v.detach().numpy()
               for k, v in fpn.state_dict().items()})
    # FrozenBatchNorm2d buffers are (weight, bias, running_mean, running_var)
    sd = convert_state_dict(sd)
    sd = remap_disprcnn2d_names(sd)
    params, frozen = split_params_frozen(to_tree(sd))

    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, (1, 3, 128, 160)).astype(np.float32)
    with torch.no_grad():
        feats_t = fpn(body(torch.from_numpy(img)))

    bb = ResNetFPNBackbone(body="R-101", out_channels=256, freeze_at=2)
    feats_j = bb.apply(
        {"params": params["backbone"], "frozen": frozen["backbone"]},
        jnp.asarray(img.transpose(0, 2, 3, 1)),
    )
    assert len(feats_j) == len(feats_t)
    for i, (gj, wt) in enumerate(zip(feats_j, feats_t)):
        got = np.asarray(gj).transpose(0, 3, 1, 2)
        want = wt.numpy()
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4,
                                   err_msg=f"FPN level {i}")
