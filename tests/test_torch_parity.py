"""Numeric torch->flax parity for the converted layer types.

Validates the conversion rules in utils/torch_import.py against live torch
ops (torch is CPU-only here). These are the layers whose conventions differ:
- ConvTranspose: torch correlates with a spatially flipped kernel relative to
  flax ConvTranspose(transpose_kernel=False) -> conversion must flip.
- torch ConvTranspose(k=3, s=2, p=1, output_padding=1) corresponds to flax
  explicit padding (1, 2) per axis, NOT 'SAME' (which is (2, 1) and shifts
  the output by one voxel). Reference uses this in the PSMNet hourglass
  (stackhourglass.py:154-160) and the mask-head 2x2 deconv.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from disprcnn_tpu.utils.torch_import import convert_tensor


def _flax_apply_deconv2d(kernel, x_nchw, strides, padding):
    mod = nn.ConvTranspose(
        kernel.shape[-1], kernel.shape[:2], strides=strides, padding=padding,
        use_bias=False,
    )
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    y = mod.apply({"params": {"kernel": jnp.asarray(kernel)}}, x)
    return np.asarray(y).transpose(0, 3, 1, 2)


def test_convtranspose2d_parity():
    torch.manual_seed(0)
    m = torch.nn.ConvTranspose2d(3, 5, kernel_size=2, stride=2, bias=False)
    x = torch.randn(2, 3, 7, 9)
    ref = m(x).detach().numpy()

    leaf, kernel = convert_tensor("deconv.weight", m.weight.detach().numpy(),
                                  transpose_conv=True)
    assert leaf == "kernel" and kernel.shape == (2, 2, 3, 5)
    got = _flax_apply_deconv2d(kernel, x.numpy(), (2, 2), "VALID")
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_convtranspose2d_k3s2_p1_op1_parity():
    torch.manual_seed(1)
    m = torch.nn.ConvTranspose2d(4, 4, kernel_size=3, stride=2, padding=1,
                                 output_padding=1, bias=False)
    x = torch.randn(1, 4, 6, 5)
    ref = m(x).detach().numpy()
    _, kernel = convert_tensor("deconv.weight", m.weight.detach().numpy(),
                               transpose_conv=True)
    got = _flax_apply_deconv2d(kernel, x.numpy(), (2, 2), [(1, 2), (1, 2)])
    assert got.shape == ref.shape == (1, 4, 12, 10)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_convtranspose3d_hourglass_geometry_parity():
    """The exact geometry the PSMNet hourglass up-convs use."""
    torch.manual_seed(2)
    m = torch.nn.ConvTranspose3d(6, 3, kernel_size=3, stride=2, padding=1,
                                 output_padding=1, bias=False)
    x = torch.randn(1, 6, 4, 5, 6)
    ref = m(x).detach().numpy()

    _, kernel = convert_tensor("conv5.weight", m.weight.detach().numpy(),
                               transpose_conv=True)
    assert kernel.shape == (3, 3, 3, 6, 3)
    mod = nn.ConvTranspose(3, (3, 3, 3), strides=(2, 2, 2),
                           padding=[(1, 2)] * 3, use_bias=False)
    xf = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    y = mod.apply({"params": {"kernel": jnp.asarray(kernel)}}, xf)
    got = np.asarray(y).transpose(0, 4, 1, 2, 3)
    assert got.shape == ref.shape == (1, 3, 8, 10, 12)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_conv2d_parity():
    torch.manual_seed(3)
    m = torch.nn.Conv2d(3, 4, kernel_size=3, stride=1, padding=1, bias=False)
    x = torch.randn(1, 3, 8, 8)
    ref = m(x).detach().numpy()
    _, kernel = convert_tensor("conv.weight", m.weight.detach().numpy())
    mod = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    y = mod.apply({"params": {"kernel": jnp.asarray(kernel)}},
                  jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# Activation parity of converted model components (VERDICT round-1 item 5):
# torch modules built inline with random weights, converted via the
# torch_import rules, outputs compared <= 1e-4 f32.
# ---------------------------------------------------------------------------


def _bn_params(bn):
    """torch BatchNorm (eval) -> flax BatchNorm {params, batch_stats}."""
    return (
        {"scale": jnp.asarray(bn.weight.detach().numpy()),
         "bias": jnp.asarray(bn.bias.detach().numpy())},
        {"mean": jnp.asarray(bn.running_mean.numpy()),
         "var": jnp.asarray(bn.running_var.numpy())},
    )


def _randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, bn.weight.shape[0]).astype("f")))
        bn.bias.copy_(torch.from_numpy(rng.uniform(-0.5, 0.5, bn.bias.shape[0]).astype("f")))
        bn.running_mean.copy_(torch.from_numpy(rng.uniform(-0.3, 0.3, bn.running_mean.shape[0]).astype("f")))
        bn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, bn.running_var.shape[0]).astype("f")))


def test_resnet_stem_frozen_bn_parity(rng):
    """conv7x7/s2 + BN(eval, eps 1e-5) + relu + CEIL-MODE maxpool3x3/s2.

    This fork's stem differs from torchvision: the pool is
    F.max_pool2d(k=3, s=2, padding=0, ceil_mode=True) (resnet.py:337) and
    the norm is plain eval BatchNorm2d (the FrozenBatchNorm2d forward is
    commented out in layers/batch_norm.py) — verified end to end by
    tests/test_backbone_reference_parity.py."""
    from disprcnn_tpu.models.backbone.resnet import Stem

    torch.manual_seed(4)
    conv = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    bn = torch.nn.BatchNorm2d(64).eval()
    _randomize_bn(bn, rng)
    x = torch.randn(2, 3, 64, 96)
    ref = torch.nn.functional.max_pool2d(
        torch.relu(bn(conv(x))), 3, stride=2, padding=0, ceil_mode=True
    ).detach().numpy()

    _, kernel = convert_tensor("conv1.weight", conv.weight.detach().numpy())
    params = {"conv1": {"kernel": jnp.asarray(kernel)}}
    frozen = {"FrozenBatchNorm_0": {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }}
    y = Stem().apply({"params": params, "frozen": frozen},
                     jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_psmnet_convbn3d_parity(rng):
    """ConvBN(dims=3) vs torch Conv3d+BatchNorm3d eval (reference convbn_3d)."""
    from disprcnn_tpu.models.psmnet.psmnet import ConvBN

    torch.manual_seed(5)
    conv = torch.nn.Conv3d(8, 8, 3, stride=2, padding=1, bias=False)
    bn = torch.nn.BatchNorm3d(8, eps=1e-5).eval()
    _randomize_bn(bn, rng)
    x = torch.randn(1, 8, 6, 8, 10)
    ref = bn(conv(x)).detach().numpy()

    _, kernel = convert_tensor("conv.weight", conv.weight.detach().numpy())
    p_bn, s_bn = _bn_params(bn)
    variables = {
        "params": {"Conv_0": {"kernel": jnp.asarray(kernel)}, "BatchNorm_0": p_bn},
        "batch_stats": {"BatchNorm_0": s_bn},
    }
    y = ConvBN(8, 3, 2, dims=3).apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)), train=False
    )
    np.testing.assert_allclose(np.asarray(y).transpose(0, 4, 1, 2, 3), ref, atol=1e-4)


class _TorchHourglass(torch.nn.Module):
    """Independent torch rendering of the PSMNet hourglass block
    (architecture from the PSMNet paper / stackhourglass.py semantics)."""

    def __init__(self, planes):
        super().__init__()
        conv = lambda i, o, s: torch.nn.Conv3d(i, o, 3, stride=s, padding=1, bias=False)
        bn = lambda c: torch.nn.BatchNorm3d(c, eps=1e-5)
        self.conv1 = torch.nn.Sequential(conv(planes, planes * 2, 2), bn(planes * 2))
        self.conv2 = torch.nn.Sequential(conv(planes * 2, planes * 2, 1), bn(planes * 2))
        self.conv3 = torch.nn.Sequential(conv(planes * 2, planes * 2, 2), bn(planes * 2))
        self.conv4 = torch.nn.Sequential(conv(planes * 2, planes * 2, 1), bn(planes * 2))
        self.conv5 = torch.nn.Sequential(
            torch.nn.ConvTranspose3d(planes * 2, planes * 2, 3, padding=1,
                                     output_padding=1, stride=2, bias=False),
            bn(planes * 2))
        self.conv6 = torch.nn.Sequential(
            torch.nn.ConvTranspose3d(planes * 2, planes, 3, padding=1,
                                     output_padding=1, stride=2, bias=False),
            bn(planes))

    def forward(self, x, presqu, postsqu):
        out = torch.relu(self.conv1(x))
        pre = self.conv2(out)
        pre = torch.relu(pre + postsqu) if postsqu is not None else torch.relu(pre)
        out = torch.relu(self.conv3(pre))
        out = torch.relu(self.conv4(out))
        up1 = self.conv5(out)
        post = torch.relu(up1 + (presqu if presqu is not None else pre))
        up2 = self.conv6(post)
        return up2, pre, post


def _hourglass_variables(tm):
    """torch hourglass -> flax Hourglass variables (ConvBN_0..3 + 2 deconvs)."""
    params, stats = {}, {}
    for i, seq in enumerate([tm.conv1, tm.conv2, tm.conv3, tm.conv4]):
        _, k = convert_tensor("w.weight", seq[0].weight.detach().numpy())
        p_bn, s_bn = _bn_params(seq[1].eval())
        params[f"ConvBN_{i}"] = {"Conv_0": {"kernel": jnp.asarray(k)},
                                 "BatchNorm_0": p_bn}
        stats[f"ConvBN_{i}"] = {"BatchNorm_0": s_bn}
    for j, seq in enumerate([tm.conv5, tm.conv6]):
        _, k = convert_tensor("conv5.weight", seq[0].weight.detach().numpy(),
                              transpose_conv=True)
        p_bn, s_bn = _bn_params(seq[1].eval())
        params[f"ConvTranspose_{j}"] = {"kernel": jnp.asarray(k)}
        params[f"BatchNorm_{j}"] = p_bn
        stats[f"BatchNorm_{j}"] = s_bn
    return {"params": params, "batch_stats": stats}


def test_hourglass_block_parity(rng):
    """Full hourglass (2x down, 2x transpose-up, skip adds) activation parity."""
    from disprcnn_tpu.models.psmnet.psmnet import Hourglass

    torch.manual_seed(6)
    tm = _TorchHourglass(8).eval()
    for seq in [tm.conv1, tm.conv2, tm.conv3, tm.conv4, tm.conv5, tm.conv6]:
        _randomize_bn(seq[1], rng)
    x = torch.randn(1, 8, 8, 8, 12)
    with torch.no_grad():
        ref_out, ref_pre, ref_post = tm(x, None, None)

    variables = _hourglass_variables(tm)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out, pre, post = Hourglass(8).apply(variables, xj, None, None, False)
    for got, want in ((out, ref_out), (pre, ref_pre), (post, ref_post)):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 4, 1, 2, 3), want.numpy(), atol=1e-4)


def test_trilinear_align_corners_parity():
    from disprcnn_tpu.models.psmnet.psmnet import trilinear_align_corners

    torch.manual_seed(7)
    x = torch.randn(2, 1, 6, 7, 9)
    ref = torch.nn.functional.interpolate(
        x, size=(24, 28, 36), mode="trilinear", align_corners=True
    )[:, 0].numpy()
    got = trilinear_align_corners(jnp.asarray(x[:, 0].numpy()), (24, 28, 36))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_bilinear_align_corners_parity():
    from disprcnn_tpu.models.psmnet.psmnet import bilinear_align_corners

    torch.manual_seed(8)
    x = torch.randn(2, 5, 4, 6)
    ref = torch.nn.functional.interpolate(
        x, size=(16, 24), mode="bilinear", align_corners=True
    ).numpy()
    got = bilinear_align_corners(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (16, 24)
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_soft_argmin_parity():
    """softmax-over-D expected disparity vs torch disparityregression semantics
    with NEGATIVE mindisp (submodule.py:225-231)."""
    from disprcnn_tpu.models.psmnet.psmnet import soft_argmin

    torch.manual_seed(9)
    mindisp, maxdisp = -48, 48
    cost = torch.randn(2, maxdisp - mindisp, 5, 6)
    prob = torch.nn.functional.softmax(cost, dim=1)
    disp = torch.arange(mindisp, maxdisp, dtype=torch.float32)[None, :, None, None]
    ref = torch.sum(prob * disp, dim=1).numpy()
    got = soft_argmin(jnp.asarray(prob.numpy()), mindisp, maxdisp)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
