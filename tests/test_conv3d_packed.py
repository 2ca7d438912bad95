"""Depth-packed conv3d lowering vs naive lax conv3d oracles.

The packed path (ops/conv3d_packed.py) claims to be an exact re-lay-out of
SAME 3x3x3 conv3d / stride-2 conv3d / ConvTranspose3d(k3,s2,p=(1,2)) — the
reference PSMNet trunk ops (stackhourglass.py:130-144, submodule.py:160-170).
These tests pin that claim, for both the rank-5 (B, Dg, H, W, G*C) layout and
the rank-4 (B*Dg, H, W, G*C) layout the model now uses, with B>1 so the
group-halo shifts are checked across image boundaries.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disprcnn_tpu.ops.conv3d_packed import (
    conv2d_wpacked, conv3d_packed, conv3d_packed_r4, conv3d_packed_resident,
    conv3d_packed_strided, conv3d_packed_strided_r4, conv3d_packed_transposed,
    conv3d_packed_transposed_r4, pack_depth, repack_depth, unpack_depth,
    wpack, wunpack,
)

B, D, H, W, CI, CO, G = 2, 8, 6, 10, 5, 7, 4
DG = D // G


@pytest.fixture(scope="module")
def vol():
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(k[0], (B, D, H, W, CI))
    kern = jax.random.normal(k[1], (3, 3, 3, CI, CO))
    return x, kern


def naive3d(x, kern, stride=1):
    return jax.lax.conv_general_dilated(
        x, kern, (stride,) * 3, [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def to_r4(xp):
    b, dg, h, w, gc = xp.shape
    return xp.reshape(b * dg, h, w, gc)


def from_r4(x4, b):
    n, h, w, gc = x4.shape
    return x4.reshape(b, n // b, h, w, gc)


def test_pack_roundtrip(vol):
    x, _ = vol
    xp = pack_depth(x, G)
    np.testing.assert_array_equal(unpack_depth(xp, G), x)
    np.testing.assert_array_equal(unpack_depth(repack_depth(xp, G, 2), 2), x)


def test_conv3d_packed_matches_naive(vol):
    x, kern = vol
    np.testing.assert_allclose(
        conv3d_packed(x, kern, G), naive3d(x, kern), rtol=1e-5, atol=1e-5)


def test_resident_and_r4_match_naive(vol):
    x, kern = vol
    want = pack_depth(naive3d(x, kern), G)
    xp = pack_depth(x, G)
    got5 = conv3d_packed_resident(xp, kern, G)
    np.testing.assert_allclose(got5, want, rtol=1e-5, atol=1e-5)
    got4 = conv3d_packed_r4(to_r4(xp), kern, G, DG)
    np.testing.assert_allclose(from_r4(got4, B), want, rtol=1e-5, atol=1e-5)


def test_strided_and_r4_match_naive(vol):
    x, kern = vol
    want = pack_depth(naive3d(x, kern, stride=2), G // 2)
    xp = pack_depth(x, G)
    got5 = conv3d_packed_strided(xp, kern, G)
    np.testing.assert_allclose(got5, want, rtol=1e-5, atol=1e-5)
    got4 = conv3d_packed_strided_r4(to_r4(xp), kern, G, DG)
    np.testing.assert_allclose(from_r4(got4, B), want, rtol=1e-5, atol=1e-5)


def naive_transpose3d(x, kern):
    """flax-semantics ConvTranspose3d(k3, s2, padding=(1,2)) oracle."""
    return jax.lax.conv_transpose(
        x, kern, (2, 2, 2), ((1, 2),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), transpose_kernel=False)


def test_transposed_and_r4_match_naive(vol):
    x, kern = vol
    xh = x[:, : D // 2]  # half-depth input, as in the hourglass up path
    want = pack_depth(naive_transpose3d(xh, kern), 2 * (G // 2))
    xp = pack_depth(xh, G // 2)
    got5 = conv3d_packed_transposed(xp, kern, G // 2)
    np.testing.assert_allclose(got5, want, rtol=1e-5, atol=1e-5)
    got4 = conv3d_packed_transposed_r4(to_r4(xp), kern, G // 2, (D // 2) // (G // 2))
    np.testing.assert_allclose(from_r4(got4, B), want, rtol=1e-5, atol=1e-5)


def test_conv2d_wpacked_matches_naive():
    k = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jax.random.normal(k[0], (2, 6, 12, 5))
    kern = jax.random.normal(k[1], (3, 3, 5, 7))
    want = jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = wunpack(conv2d_wpacked(wpack(x, 4), kern, 4), 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(wunpack(wpack(x, 4), 4), x)


def test_packed_hourglass_matches_unpacked():
    """Hourglass packed_group path vs the canonical rank-5 path, sharing one
    param tree (they are declared checkpoint-compatible)."""
    from disprcnn_tpu.models.psmnet.psmnet import Hourglass

    p = 6
    x = jax.random.normal(jax.random.PRNGKey(5), (2, D, 8, 16, p))
    packed = Hourglass(p, packed_group=G, packed_dg=DG)
    plain = Hourglass(p)
    xp4 = to_r4(pack_depth(x, G))
    variables = packed.init(jax.random.PRNGKey(6), xp4, None, None, False)
    out_p, pre_p, post_p = packed.apply(variables, xp4, None, None, False)
    out, pre, post = plain.apply(variables, x, None, None, False)
    np.testing.assert_allclose(
        unpack_depth(from_r4(out_p, 2), G), out, rtol=1e-4, atol=1e-4)
    # pre: half-res (group G/2); post: half-res too
    np.testing.assert_allclose(
        unpack_depth(from_r4(pre_p, 2), G // 2), pre, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        unpack_depth(from_r4(post_p, 2), G // 2), post, rtol=1e-4, atol=1e-4)


def test_packed_bn_matches_flax():
    import flax.linen as nn

    from disprcnn_tpu.models.psmnet.psmnet import _PackedBN

    c = 5
    x = jax.random.normal(jax.random.PRNGKey(7), (2, D, H, W, c))
    xp4 = to_r4(pack_depth(x, G))
    bn_p = _PackedBN(c, G)
    variables = bn_p.init(jax.random.PRNGKey(8), xp4, True)
    # randomize stats/params so eval isn't trivially identity
    variables = jax.tree.map(
        lambda a: a + 0.3 * jax.random.normal(jax.random.PRNGKey(9), a.shape),
        variables)
    variables["batch_stats"]["var"] = jnp.abs(variables["batch_stats"]["var"]) + 0.1

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    for train in (True, False):
        got, mut_p = bn_p.apply(variables, xp4, train, mutable=["batch_stats"])
        want, mut = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        ).apply(variables, x, mutable=["batch_stats"])
        np.testing.assert_allclose(
            unpack_depth(from_r4(got, 2), G), want, rtol=1e-5, atol=1e-5)
        if train:
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
                mut_p["batch_stats"], mut["batch_stats"])


def test_batched_nms_matches_per_image():
    """nms_topk_batched / double_view_nms_topk_batched / postprocess_batched
    must reproduce the per-image functions row for row (the batched forms
    exist purely for TPU lowering speed)."""
    from disprcnn_tpu.ops.nms import (
        double_view_nms_topk, double_view_nms_topk_batched, nms_topk,
        nms_topk_batched,
    )

    k = jax.random.split(jax.random.PRNGKey(11), 4)
    bsz, n = 3, 64
    xy = jax.random.uniform(k[0], (bsz, n, 2)) * 200
    wh = jax.random.uniform(k[1], (bsz, n, 2)) * 80 + 4
    boxes = jnp.concatenate([xy, xy + wh], axis=-1)
    boxes2 = boxes + jax.random.normal(k[2], boxes.shape) * 3
    scores = jax.random.uniform(k[3], (bsz, n))
    valid = scores > 0.1

    bi, bok = nms_topk_batched(boxes, scores, valid, 0.5, 10)
    for i in range(bsz):
        si, sok = nms_topk(boxes[i], scores[i], valid[i], 0.5, 10)
        np.testing.assert_array_equal(np.asarray(bi[i]), np.asarray(si))
        np.testing.assert_array_equal(np.asarray(bok[i]), np.asarray(sok))

    bi, bok = double_view_nms_topk_batched(boxes, boxes2, scores, valid, 0.6, 8)
    for i in range(bsz):
        si, sok = double_view_nms_topk(boxes[i], boxes2[i], scores[i], valid[i], 0.6, 8)
        np.testing.assert_array_equal(np.asarray(bi[i]), np.asarray(si))
        np.testing.assert_array_equal(np.asarray(bok[i]), np.asarray(sok))


def test_srpn_postprocess_batched_matches_per_image():
    from disprcnn_tpu.models.rpn import stereo_rpn

    k = jax.random.split(jax.random.PRNGKey(13), 3)
    bsz, n = 2, 200
    anchors = jnp.concatenate(
        [jax.random.uniform(k[0], (n, 2)) * 300,
         jnp.full((n, 2), 40.0) + jax.random.uniform(k[0], (n, 2)) * 60],
        axis=-1,
    )
    anchors = anchors.at[:, 2:].set(anchors[:, :2] + anchors[:, 2:])
    logits = jax.random.normal(k[1], (bsz, n, 2))
    deltas = jax.random.normal(k[2], (bsz, n, 6)) * 0.1
    got = stereo_rpn.postprocess_batched(
        anchors, logits, deltas, (384, 1248), 128, 16, 0.7, 0.0)
    for i in range(bsz):
        want = stereo_rpn.postprocess(
            anchors, logits[i], deltas[i], (384, 1248), 128, 16, 0.7, 0.0)
        np.testing.assert_allclose(np.asarray(got.left[i]), np.asarray(want.left), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got.score[i]), np.asarray(want.score), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got.valid[i]), np.asarray(want.valid))


def test_basicblock_wpacked_matches_plain():
    """BasicBlock(wpack=2) vs BasicBlock() sharing one param tree — the C=64
    feature-extraction section runs W-packed by 2."""
    from disprcnn_tpu.models.psmnet.psmnet import BasicBlock

    x = jax.random.normal(jax.random.PRNGKey(21), (2, 6, 8, 64))
    packed = BasicBlock(64, wpack=2)
    plain = BasicBlock(64)
    xp = wpack(x, 2)
    variables = packed.init(jax.random.PRNGKey(22), xp, False)
    got = wunpack(packed.apply(variables, xp, False), 2)
    want = plain.apply(variables, x, False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_classif_repack_final_conv_matches_naive():
    """The classif head's repack (slice-major (dg, g, c) -> channels) + G=D
    packed 1-channel conv must equal a naive conv3d over the unpacked volume
    (psmnet.py classif: the only place the depth packing changes group)."""
    b, dg, g, c, hw = 2, 6, 4, 5, 8
    d = dg * g
    k = jax.random.split(jax.random.PRNGKey(31), 2)
    x = jax.random.normal(k[0], (b, d, hw, hw, c))
    kern = jax.random.normal(k[1], (3, 3, 3, c, 1))

    # model-side path: rank-4 packed (b*dg, h, w, g*c) -> (b, h, w, d*c)
    zp = to_r4(pack_depth(x, g))
    zc = zp.reshape(b, dg, hw, hw, g * c)
    zc = zc.transpose(0, 2, 3, 1, 4).reshape(b, hw, hw, d * c)
    got = conv3d_packed_r4(zc, kern, d, 1)  # (b, h, w, d)

    want = naive3d(x, kern)[..., 0]  # (b, d, h, w)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), np.asarray(want),
        rtol=1e-4, atol=1e-4)


def test_cost_volume_packed_matches_oracle():
    """build_cost_volume_packed vs a literal numpy rendering of the reference
    shift-concat loop (stackhourglass.py:117-128, incl. negative mindisp),
    and consistency with the canonical build_cost_volume."""
    from disprcnn_tpu.models.psmnet.psmnet import (
        build_cost_volume, build_cost_volume_packed,
    )

    b, h, w, c, g = 2, 4, 10, 3, 4
    lo, hi = -4, 4  # D = 8
    k = jax.random.split(jax.random.PRNGKey(41), 2)
    lf = jax.random.normal(k[0], (b, h, w, c))
    rf = jax.random.normal(k[1], (b, h, w, c))

    # oracle: cost[b, d, h, x] = concat(left[x], right[x - i]) where both in
    # bounds, zeros elsewhere
    lf_n, rf_n = np.asarray(lf), np.asarray(rf)
    want = np.zeros((b, hi - lo, h, w, 2 * c), np.float32)
    for di, i in enumerate(range(lo, hi)):
        for x in range(w):
            if 0 <= x - i < w:
                want[:, di, :, x, :c] = lf_n[:, :, x]
                want[:, di, :, x, c:] = rf_n[:, :, x - i]

    got_plain = np.asarray(build_cost_volume(lf, rf, lo, hi))
    np.testing.assert_allclose(got_plain, want, rtol=1e-6, atol=1e-6)

    got_packed = build_cost_volume_packed(lf, rf, lo, hi, g)
    # unpack: (B*Dg, H, W, G*2C) -> (B, D, H, W, 2C)
    dg = (hi - lo) // g
    up = np.asarray(got_packed).reshape(b, dg, h, w, g, 2 * c)
    up = up.transpose(0, 1, 4, 2, 3, 5).reshape(b, hi - lo, h, w, 2 * c)
    np.testing.assert_allclose(up, want, rtol=1e-6, atol=1e-6)

