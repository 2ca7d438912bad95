"""Released-checkpoint layout readiness (VERDICT r1 missing #3): synthesize
state dicts with the EXACT key/shape structure of the four released artifact
layouts and push them through torch_import:

1. mrcnn-format 2D   — covered by tests/test_torch_import.py +
   test_backbone_reference_parity.py (importer feeds the activation oracle).
2. PSMNet bestmodel  — covered by tests/test_psmnet_reference_parity.py.
3. pointrcnn.pth     — HERE: torch fixture built from the vendored
   pt_utils.SharedMLP/Conv1d (exact 'layer{i}.conv'/'bn.bn' nesting,
   lib/pointnet2_lib/pointnet2/pytorch_utils.py:5-101), container structure
   per lib/net/{rpn,rcnn_net,pointnet2_msg}.py, DDP 'module.' prefixes.
4. full DispRCNN3D   — HERE: dispnet.* + pcnet.* scopes in one dict
   (disprcnn3d.py:35-42 load semantics).

Round-trip check: the imported tree's flattened paths/shapes must EXACTLY
equal our PointRCNN's init variables (jax.eval_shape — no compute)."""
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PT_UTILS = ("/root/reference/disprcnn/modeling/pointnet_module/point_rcnn/"
            "lib/pointnet2_lib/pointnet2/pytorch_utils.py")


@pytest.fixture(scope="module")
def pt_utils():
    spec = importlib.util.spec_from_file_location("ref_pt_utils", PT_UTILS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_pt_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


# rpn.yaml / reference lib/config.py structure constants
RPN_MLPS = [[[16, 16, 32], [32, 32, 64]],
            [[64, 64, 128], [64, 96, 128]],
            [[128, 196, 256], [128, 196, 256]],
            [[256, 256, 512], [256, 384, 512]]]
RPN_FP = [[128, 128], [256, 256], [512, 512], [512, 512]]
RCNN_MLPS = [[128, 128, 128], [128, 128, 256], [256, 256, 512]]


def _head_seq(pt, pre, fcs, out_c, bn):
    layers = [None] * 0
    seq = []
    for c in fcs:
        seq.append(pt.Conv1d(pre, c, bn=bn))
        pre = c
    seq.append(pt.Conv1d(pre, out_c, activation=None))
    seq.insert(1, nn.Dropout(0.5))  # DP_RATIO >= 0 always inserts (rpn.py:62)
    return nn.Sequential(*seq)


def _build_fixture(pt):
    from disprcnn_tpu.models.pointrcnn.point_rcnn import PointRCNN
    from disprcnn_tpu.models.pointrcnn.rcnn3d import RCNN_CODEC

    rpn_reg_c = PointRCNN.rpn_codec.reg_channels
    rcnn_reg_c = RCNN_CODEC.reg_channels

    class SA(nn.Module):
        def __init__(self, specs, bn):
            super().__init__()
            self.mlps = nn.ModuleList(
                [pt.SharedMLP(s, bn=bn) for s in specs])

    class FP(nn.Module):
        def __init__(self, spec):
            super().__init__()
            self.mlp = pt.SharedMLP(spec, bn=True)

    class MSG(nn.Module):
        def __init__(self):
            super().__init__()
            cin, skips, sas = 0, [0], []
            for k in range(4):
                specs = [[cin + 3] + m for m in RPN_MLPS[k]]
                cout = sum(m[-1] for m in RPN_MLPS[k])
                sas.append(SA(specs, bn=True))
                skips.append(cout)
                cin = cout
            self.SA_modules = nn.ModuleList(sas)
            fps = []
            for k in range(4):
                pre = RPN_FP[k + 1][-1] if k + 1 < 4 else cin
                fps.append(FP([pre + skips[k]] + RPN_FP[k]))
            self.FP_modules = nn.ModuleList(fps)

    class RPN(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone_net = MSG()
            self.rpn_cls_layer = _head_seq(pt, RPN_FP[0][-1], [128], 1, bn=True)
            self.rpn_reg_layer = _head_seq(pt, RPN_FP[0][-1], [128], rpn_reg_c, bn=True)

    class RCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.xyz_up_layer = pt.SharedMLP([5, 128, 128], bn=False)
            self.merge_down_layer = pt.SharedMLP([256, 128], bn=False)
            cin = 128
            sas = []
            for k in range(3):
                sas.append(SA([[cin + 3] + RCNN_MLPS[k]], bn=False))
                cin = RCNN_MLPS[k][-1]
            self.SA_modules = nn.ModuleList(sas)
            self.cls_layer = _head_seq(pt, cin, [256, 256], 1, bn=False)
            self.reg_layer = _head_seq(pt, cin, [256, 256], rcnn_reg_c, bn=False)

    class PR(nn.Module):
        def __init__(self):
            super().__init__()
            self.rpn = RPN()
            self.rcnn_net = RCNN()

    return PR()


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


@pytest.fixture(scope="module")
def model_shapes():
    """Shape-only init of our PointRCNN at the shipped rpn.yaml geometry."""
    from disprcnn_tpu.models.pointrcnn.point_rcnn import PointRCNN

    model = PointRCNN(npoints=768, sa_npoints=(768, 512, 256, 64),
                      rcnn_enabled=True)
    pts = jnp.zeros((2, 768, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    vars_shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "sampling": rng}, pts, jnp.ones((2,), bool),
            jnp.zeros((2,)), jnp.zeros((2, 3)), train=False,
        )
    )
    return vars_shapes


def test_pointrcnn_pth_layout_roundtrip(pt_utils, model_shapes, tmp_path):
    from disprcnn_tpu.utils.torch_import import import_pointrcnn

    fix = _build_fixture(pt_utils)
    sd = {f"module.{k}": v for k, v in fix.state_dict().items()}
    path = tmp_path / "pointrcnn.pth"
    torch.save({"model": sd}, path)

    params, stats = import_pointrcnn(str(path), rcnn_n_cls_fc=2, rcnn_n_reg_fc=2)
    got_p = _flatten(params)
    want_p = _flatten(model_shapes["params"])
    assert got_p == want_p  # exact path + shape match, both directions
    got_s = _flatten(stats)
    want_s = _flatten(model_shapes["batch_stats"])
    assert got_s == want_s


def test_full_disprcnn3d_layout_roundtrip(pt_utils, model_shapes):
    """dispnet.* + pcnet.* in one state dict -> {'idispnet','pointrcnn'}."""
    from disprcnn_tpu.utils.torch_import import import_disprcnn3d

    fix = _build_fixture(pt_utils)
    sd = {f"pcnet.{k}": v.numpy() for k, v in fix.state_dict().items()}
    # a sliver of dispnet keys proves the scope split (full PSMNet layout is
    # exercised by test_psmnet_reference_parity)
    sd["dispnet.feature_extraction.firstconv.0.0.weight"] = np.zeros(
        (32, 3, 3, 3), np.float32)
    sd["dispnet.feature_extraction.firstconv.0.1.weight"] = np.ones(32, np.float32)
    sd["dispnet.feature_extraction.firstconv.0.1.bias"] = np.zeros(32, np.float32)
    sd["dispnet.feature_extraction.firstconv.0.1.running_mean"] = np.zeros(32, np.float32)
    sd["dispnet.feature_extraction.firstconv.0.1.running_var"] = np.ones(32, np.float32)

    params, stats = import_disprcnn3d(sd)
    assert _flatten(params["pointrcnn"]) == _flatten(model_shapes["params"])
    assert params["idispnet"]["feature_extraction"]["ConvBN_0"]["Conv_0"][
        "kernel"].shape == (3, 3, 3, 32)
    assert stats["idispnet"]["feature_extraction"]["ConvBN_0"][
        "BatchNorm_0"]["mean"].shape == (32,)
