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
