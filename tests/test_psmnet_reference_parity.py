"""Whole-model activation parity: our PSMNet vs the VENDORED REFERENCE torch
implementation (modeling/psmnet/stackhourglass.py), weights transferred with
utils.torch_import.import_psmnet.

The reference source is loaded as an isolated package (no disprcnn package
import) and treated as a numerical oracle — randomly initialized with a
fixed seed, run in eval mode, and compared end to end. This pins every
architectural choice at once: stem/layer/SPP wiring, cost-volume shift
semantics, packed-conv3d trunk, ConvTranspose padding+flip, align_corners
upsampling, soft-argmin.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_DIR = "/root/reference/disprcnn/modeling/psmnet"


@pytest.fixture(scope="module")
def ref_psm():
    pkg = types.ModuleType("refpsm")
    pkg.__path__ = [REF_DIR]
    sys.modules["refpsm"] = pkg
    mods = {}
    for name in ("submodule", "stackhourglass"):
        spec = importlib.util.spec_from_file_location(
            f"refpsm.{name}", f"{REF_DIR}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refpsm.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods["stackhourglass"]


def _randomize_bns(model, gen):
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.weight.uniform_(0.6, 1.4, generator=gen)
                m.bias.uniform_(-0.3, 0.3, generator=gen)
                m.running_mean.uniform_(-0.2, 0.2, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)


@pytest.mark.slow
def test_psmnet_full_model_parity(ref_psm):
    from disprcnn_tpu.models.psmnet.psmnet import PSMNet
    from disprcnn_tpu.utils.torch_import import import_psmnet

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    tm = ref_psm.PSMNet(maxdisp=48, mindisp=-48, input_size=224).eval()
    _randomize_bns(tm, gen)
    # the reference's kaiming init explodes activations to ~1e7 through 25
    # untrained layers (useless as an oracle in f32); scale convs down
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d,
                              torch.nn.ConvTranspose3d)):
                m.weight.mul_(0.25)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_psmnet(sd)

    rng = np.random.default_rng(2)
    left = rng.uniform(-1, 1, (1, 3, 224, 224)).astype(np.float32)
    right = rng.uniform(-1, 1, (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = tm({"left": torch.from_numpy(left),
                   "right": torch.from_numpy(right)})
    if isinstance(want, (tuple, list)):
        want = want[-1]
    want = want.numpy()

    model = PSMNet(maxdisp=48, mindisp=-48)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(left.transpose(0, 2, 3, 1)),
        jnp.asarray(right.transpose(0, 2, 3, 1)),
        train=False,
    )
    got = np.asarray(got)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)
