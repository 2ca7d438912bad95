"""Quirk-exact SRPN head parity vs the VENDORED REFERENCE torch source
(modeling/rpn/stereo_rpn/srpn.py): same weights, same inputs, the reference's
planar-softmax-then-interleaved-read chain must match our
SRPNHead(quirk_exact=True) output element-for-element."""
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


def _ensure_pkg(name, path=None):
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    if path:
        pkg.__path__ = [path]
    sys.modules[name] = pkg
    return pkg


@pytest.fixture(scope="module")
def ref_srpn():
    _ensure_pkg("disprcnn", REF)
    _ensure_pkg("disprcnn.modeling", f"{REF}/modeling")
    _load("disprcnn.modeling.box_coder", f"{REF}/modeling/box_coder.py")
    _ensure_pkg("disprcnn.modeling.rpn", f"{REF}/modeling/rpn")
    ag = types.ModuleType("disprcnn.modeling.rpn.anchor_generator")
    ag.make_anchor_generator = None  # only used by StereoRPN.__init__, not the head
    sys.modules["disprcnn.modeling.rpn.anchor_generator"] = ag
    _ensure_pkg("disprcnn.modeling.rpn.stereo_rpn", f"{REF}/modeling/rpn/stereo_rpn")
    inf = types.ModuleType("disprcnn.modeling.rpn.stereo_rpn.inference")
    inf.make_srpn_postprocessor = None
    sys.modules["disprcnn.modeling.rpn.stereo_rpn.inference"] = inf
    loss = types.ModuleType("disprcnn.modeling.rpn.stereo_rpn.loss")
    loss.make_srpn_loss_evaluator = None
    sys.modules["disprcnn.modeling.rpn.stereo_rpn.loss"] = loss
    return _load("disprcnn.modeling.rpn.stereo_rpn.srpn",
                 f"{REF}/modeling/rpn/stereo_rpn/srpn.py")


@pytest.mark.slow
def test_srpn_head_quirk_exact_matches_reference(ref_srpn):
    from disprcnn_tpu.models.rpn.stereo_rpn import SRPNHead

    torch.manual_seed(0)
    cin, a = 32, 3
    head_t = ref_srpn.SRPNHead(None, cin, a).eval()

    rng = np.random.default_rng(0)
    feats = [rng.normal(size=(1, cin, 16, 20)).astype(np.float32),
             rng.normal(size=(1, cin, 8, 12)).astype(np.float32)]
    with torch.no_grad():
        t_logits, t_bbox = head_t(
            [torch.from_numpy(f) for f in feats],
            [torch.from_numpy(np.roll(f, 1, axis=3)) for f in feats],
        )

    def tw(name):
        return np.asarray(getattr(head_t, name).weight.detach())

    def tb(name):
        return np.asarray(getattr(head_t, name).bias.detach())

    params = {
        "conv": {"kernel": jnp.asarray(tw("conv").transpose(2, 3, 1, 0)),
                 "bias": jnp.asarray(tb("conv"))},
        "cls_logits": {"kernel": jnp.asarray(tw("cls_logits").transpose(2, 3, 1, 0)),
                       "bias": jnp.asarray(tb("cls_logits"))},
        "bbox_pred": {"kernel": jnp.asarray(tw("bbox_pred").transpose(2, 3, 1, 0)),
                      "bias": jnp.asarray(tb("bbox_pred"))},
    }
    lf = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats]
    rf = [jnp.asarray(np.roll(f, 1, axis=3).transpose(0, 2, 3, 1)) for f in feats]

    head_j = SRPNHead(in_channels=cin, num_anchors=a, quirk_exact=True)
    outs = head_j.apply({"params": params}, lf, rf)

    for lvl, (j_logit, j_delta) in enumerate(outs):
        tl = np.asarray(t_logits[lvl])  # (B, 2A, H, W) planar-softmaxed
        b, _, h, w = tl.shape
        # reference consumers read channels interleaved: (A, 2) split
        want_logit = tl.reshape(b, a, 2, h, w).transpose(0, 3, 4, 1, 2)
        np.testing.assert_allclose(np.asarray(j_logit), want_logit, atol=2e-6)
        tbx = np.asarray(t_bbox[lvl]).reshape(b, a, 6, h, w).transpose(0, 3, 4, 1, 2)
        np.testing.assert_allclose(np.asarray(j_delta), tbx, atol=2e-5)
        # quirk output rows are probability pairs (the misread the reference
        # loss double-softmaxes): each (anchor, :) sums to 1... only in the
        # PLANAR pairing, not the interleaved read — just sanity the range
        assert np.all(np.asarray(j_logit) >= 0) and np.all(np.asarray(j_logit) <= 1)

    # clean mode must differ (the flag is load-bearing)
    outs_clean = SRPNHead(in_channels=cin, num_anchors=a, quirk_exact=False).apply(
        {"params": params}, lf, rf
    )
    assert not np.allclose(np.asarray(outs_clean[0][0]), np.asarray(outs[0][0]))
