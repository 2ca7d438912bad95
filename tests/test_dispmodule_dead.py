"""Adjudication test: the reference DispModule's forward is DEAD CODE.

disprcnn_tpu/models/psmnet/dispmodule.py reimplements the documented INTENT
of the reference's FPN-feature iDispNet variant rather than its exact graph.
This test proves, against the VENDORED reference torch source, that the
exact graph cannot run at all — so intent-faithful is the only faithful
option:

1. modeling/psmnet/dispmodule.py:73-75 constructs the inner PSMNet with
   positionally-scrambled arguments:
       PSMNet(maxdisp, mindisp, is_module, len(pooler_scales),
              single_modal_weighted_average, conv_layers)
   against the signature (maxdisp, mindisp=0, input_size=224,
   is_module=False, feature_level=1, single_modal_weight_average=False,
   conv_layers=(), use_disparity_regression=True)
   (stackhourglass.py:55-58) — is_module lands in input_size, the scale
   count lands in is_module, conv_layers lands in
   single_modal_weight_average. AND the ctor then ignores every one of
   those parameters: nothing after mindisp is stored or read
   (stackhourglass.py:59-104), so the module built is always the stock
   3-channel-image PSMNet.
2. DispModule.forward feeds that PSMNet ROI-POOLED FPN FEATURES — a
   (N, len(pooler_scales)*256, 28, 28) tensor (extract_expand_features
   channel-concat, dispmodule.py:116-129; invocation dispmodule.py:277) —
   while PSMNet.forward unconditionally runs self.feature_extraction
   (stackhourglass.py:112), whose first conv expects 3 input channels
   (submodule.py feature_extraction firstconv). Every real invocation
   therefore raises a channel-mismatch RuntimeError; no shipped config can
   make it run (the scrambled args that LOOK like they adapt the trunk are
   discarded per (1)).

Shipped 3-stage configs keep this path off (DISPNET_ON=False in
configs/kitti/**), which is why the repo ships it broken.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/disprcnn/modeling/psmnet"


@pytest.fixture(scope="module")
def ref_psm():
    pkg = types.ModuleType("refpsm_dead")
    pkg.__path__ = [REF_DIR]
    sys.modules["refpsm_dead"] = pkg
    mods = {}
    for name in ("submodule", "stackhourglass"):
        spec = importlib.util.spec_from_file_location(
            f"refpsm_dead.{name}", f"{REF_DIR}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refpsm_dead.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods["stackhourglass"]


@pytest.mark.slow
def test_reference_dispmodule_psmnet_ctor_args_are_scrambled_and_ignored(ref_psm):
    """Replicate dispmodule.py:73-75's exact positional ctor call with the
    reference cfg defaults (MODEL.DISPNET.*, defaults.py:530-549) and verify
    the resulting module is byte-identical in structure to the stock one —
    i.e. the 'configuration' is discarded."""
    maxdisp, mindisp = 48, -48
    pooler_scales = (0.25, 0.125, 0.0625, 0.03125)
    single_modal_weighted_average = False
    conv_layers = ()
    is_module = True

    torch.manual_seed(0)
    scrambled = ref_psm.PSMNet(maxdisp, mindisp, is_module,
                               len(pooler_scales),
                               single_modal_weighted_average, conv_layers)
    torch.manual_seed(0)
    stock = ref_psm.PSMNet(maxdisp, mindisp)

    s1 = scrambled.state_dict()
    s2 = stock.state_dict()
    assert list(s1.keys()) == list(s2.keys())
    for k in s1:
        assert torch.equal(s1[k], s2[k]), k
    # none of the post-mindisp args are even retained
    for attr in ("input_size", "is_module", "feature_level",
                 "single_modal_weight_average", "conv_layers",
                 "use_disparity_regression"):
        assert not hasattr(scrambled, attr), attr
    # the trunk is the stock 3-channel IMAGE tower
    assert scrambled.feature_extraction.firstconv[0][0].in_channels == 3


@pytest.mark.slow
def test_reference_dispmodule_forward_is_unrunnable(ref_psm):
    """Feed the PSMNet exactly what DispModule.forward feeds it — channel-
    concat ROI-pooled FPN features, (N, 4*256, 28, 28) at the default cfg
    (extract_expand_features, dispmodule.py:116-129) — and show the stock
    image tower rejects it. This is the reference's ONLY call site for the
    module (dispmodule.py:277,300), so the forward path is dead code."""
    tm = ref_psm.PSMNet(48, -48, True, 4, False, ()).eval()
    n_levels, c_fpn, res = 4, 256, 28
    left_roi_feature = torch.zeros(2, n_levels * c_fpn, res, res)
    right_roi_feature = torch.zeros(2, n_levels * c_fpn, res, res)
    with pytest.raises(RuntimeError, match="channel|size|weight"):
        with torch.no_grad():
            tm((left_roi_feature, right_roi_feature))
