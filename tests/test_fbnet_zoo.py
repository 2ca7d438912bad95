"""FBNet arch-def zoo parity vs the VENDORED torch builder
(modeling/backbone/{fbnet_builder,fbnet_modeldef}.py): for each arch the
trainable-parameter count and the BN-running-stat count of our trunk must
equal the reference FBNetTrunk's (first conv + backbone stages) — this pins
the exact channel arithmetic (input-depth expansion, _get_divisible_by,
always-present pw conv, DW_CONV_SKIP_{BN,RELU})."""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/disprcnn"


def _load(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_builder():
    import torch.nn as nn
    import torch.nn.functional as F

    if "disprcnn" not in sys.modules:
        pkg = types.ModuleType("disprcnn")
        pkg.__path__ = [REF]
        sys.modules["disprcnn"] = pkg
    bn = _load("disprcnn._bn_fb", f"{REF}/layers/batch_norm.py")
    layers = sys.modules.get("disprcnn.layers") or types.ModuleType("disprcnn.layers")
    layers.FrozenBatchNorm2d = bn.FrozenBatchNorm2d
    layers.BatchNorm2d = nn.BatchNorm2d
    layers.Conv2d = nn.Conv2d
    layers.interpolate = F.interpolate
    sys.modules["disprcnn.layers"] = layers
    misc = types.ModuleType("disprcnn.layers.misc")

    class _NewEmptyTensorOp:
        pass

    misc._NewEmptyTensorOp = _NewEmptyTensorOp
    sys.modules["disprcnn.layers.misc"] = misc
    builder = _load("ref_fbnet_builder", f"{REF}/modeling/backbone/fbnet_builder.py")
    modeldef = _load("ref_fbnet_modeldef", f"{REF}/modeling/backbone/fbnet_modeldef.py")
    return builder, modeldef


def _torch_trunk_counts(builder_mod, arch_def):
    arch = builder_mod.unify_arch_def(arch_def)
    b = builder_mod.FBNetBuilder(
        width_ratio=1.0, bn_type="bn", width_divisor=1,
        dw_skip_bn=True, dw_skip_relu=True,
    )
    first = b.add_first(arch["first"], dim_in=3)
    trunk = builder_mod.get_blocks(arch, stage_indices=arch["backbone"])
    stages = b.add_blocks(trunk["stages"])
    mod = torch.nn.Sequential(first, stages)
    n_params = sum(p.numel() for p in mod.parameters())
    n_stats = sum(v.numel() for k, v in mod.state_dict().items()
                  if k.endswith(("running_mean", "running_var")))
    return n_params, n_stats, b.last_depth


@pytest.mark.parametrize("arch", ["default", "mobilenet_v2", "cham_v1a",
                                  "xirb16d_dsmask", "cham_v2"])
def test_fbnet_param_count_matches_reference(ref_builder, arch):
    builder_mod, modeldef = ref_builder
    from disprcnn_tpu.models.backbone.fbnet import MODEL_ARCH, FBNet

    # the ported table must BE the reference table
    assert MODEL_ARCH[arch] == modeldef.MODEL_ARCH[arch]

    want_params, want_stats, want_cout = _torch_trunk_counts(
        builder_mod, modeldef.MODEL_ARCH[arch])

    model = FBNet(arch=arch)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    got_params = sum(int(np.prod(l.shape))
                     for l in jax.tree.leaves(shapes["params"]))
    got_stats = sum(int(np.prod(l.shape))
                    for l in jax.tree.leaves(shapes.get("batch_stats", {})))
    assert got_params == want_params, (arch, got_params, want_params)
    assert got_stats == want_stats, (arch, got_stats, want_stats)

    # last backbone feature width matches builder.last_depth
    def init_and_apply():
        v = model.init(jax.random.PRNGKey(0), x)
        return model.apply(v, x)

    outs = jax.eval_shape(init_and_apply)
    assert outs[-1].shape[-1] == want_cout
