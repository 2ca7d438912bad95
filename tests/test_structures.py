import numpy as np
import jax
import jax.numpy as jnp

from disprcnn_tpu import structures as st


def test_boxes2d_pytree_and_ops(rng):
    xyxy = jnp.asarray([[10.0, 10, 50, 40], [0, 0, 5, 5]])
    b = st.pad_boxes(xyxy, 4, (100, 60), scores=jnp.asarray([0.9, 0.1]))
    assert b.capacity == 4 and int(b.num_valid()) == 2
    # pytree: jit through it
    f = jax.jit(lambda bb: bb.resize((200, 120)))
    b2 = f(b)
    np.testing.assert_allclose(np.asarray(b2.xyxy[0]), [20, 20, 100, 80])
    assert b2.size == (200, 120)
    # hflip with -1 convention
    b3 = b.hflip()
    np.testing.assert_allclose(np.asarray(b3.xyxy[0]), [100 - 50 - 1, 10, 100 - 10 - 1, 40])
    # remove_small invalidates
    b4 = b.remove_small(10.0)
    assert bool(b4.valid[0]) and not bool(b4.valid[1])
    # clip
    big = st.pad_boxes(jnp.asarray([[-5.0, -5, 300, 300]]), 2, (100, 60))
    np.testing.assert_allclose(np.asarray(big.clip_to_image().xyxy[0]), [0, 0, 99, 59])


def test_box3d_roundtrip(rng):
    b = jnp.asarray(
        [[1.0, 1.5, 10.0, 1.5, 1.6, 3.9, 0.5], [-2.0, 1.4, 20.0, 1.4, 1.7, 4.2, -1.2]]
    )
    corners = st.corners_from_xyzhwl_ry(b)
    assert corners.shape == (2, 8, 3)
    back = st.xyzhwl_ry_from_corners(corners)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), rtol=1e-5, atol=1e-5)
    # permutation round trip
    np.testing.assert_allclose(
        np.asarray(st.ry_lhwxyz_to_xyzhwl_ry(st.xyzhwl_ry_to_ry_lhwxyz(b))), np.asarray(b)
    )


def test_box3d_corner_layout():
    # unrotated box: corner0 = (x - l/2, y, z + w/2) per reference layout
    b = jnp.asarray([[0.0, 2.0, 10.0, 1.0, 2.0, 4.0, 0.0]])
    c = np.asarray(st.corners_from_xyzhwl_ry(b))[0]
    np.testing.assert_allclose(c[0], [-2.0, 2.0, 11.0], atol=1e-6)
    np.testing.assert_allclose(c[1], [-2.0, 1.0, 11.0], atol=1e-6)  # top
    np.testing.assert_allclose(c[7], [2.0, 2.0, 9.0], atol=1e-6)


def test_rotate_points_along_y():
    pts = jnp.asarray([[[1.0, 5.0, 0.0]]])
    out = np.asarray(st.rotate_points_along_y(pts, jnp.asarray([np.pi / 2])))
    # x' = x cos - z sin = 0 ; z' = x sin + z cos = 1
    np.testing.assert_allclose(out[0, 0], [0.0, 5.0, 1.0], atol=1e-6)


def _toy_calib():
    p2 = jnp.asarray([[700.0, 0, 600, 0], [0, 700, 180, 0], [0, 0, 1, 0]])
    p3 = p2.at[0, 3].set(-700.0 * 0.54)  # baseline 0.54 m
    return st.Calib(P2=p2, P3=p3, size=(1242, 375))


def test_calib_projection_roundtrip():
    cal = _toy_calib()
    u = jnp.asarray([100.0, 640.0])
    v = jnp.asarray([50.0, 200.0])
    d = jnp.asarray([10.0, 25.0])
    pts = cal.img_to_rect(u, v, d)
    uv, depth = cal.rect_to_img(pts)
    np.testing.assert_allclose(np.asarray(uv[:, 0]), np.asarray(u), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), np.asarray(v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(d), rtol=1e-5)


def test_calib_disparity_depth():
    cal = _toy_calib()
    assert abs(float(cal.stereo_baseline) - 700 * 0.54) < 1e-4
    disp = jnp.asarray(37.8)  # depth = 700*0.54/37.8 = 10
    np.testing.assert_allclose(float(cal.disparity_to_depth(disp)), 10.0, rtol=1e-4)


def test_calib_crop_resize():
    cal = _toy_calib()
    c2 = cal.crop((100, 50, 600, 250))
    assert c2.size == (500, 200)
    np.testing.assert_allclose(float(c2.cu), 500.0)
    np.testing.assert_allclose(float(c2.cv), 130.0)
    c3 = cal.resize((621, 188))
    np.testing.assert_allclose(float(c3.fu), 350.0, rtol=1e-3)


def test_disparity_resize_value_scaling():
    disp = jnp.full((40, 80), 16.0)
    out = st.resize_disparity(disp, (20, 40))
    np.testing.assert_allclose(np.asarray(out), 8.0, rtol=1e-5)
    out2 = st.resize_disparity(disp, (40, 160))
    np.testing.assert_allclose(np.asarray(out2), 32.0, rtol=1e-5)


def test_paste_masks_in_image():
    # full-one 4x4 mask pasted into a 20x30 image at box (5, 5, 14, 12)
    masks = jnp.ones((1, 4, 4)) * 0.9
    boxes = jnp.asarray([[5.0, 5.0, 14.0, 12.0]])
    out = np.asarray(
        st.paste_masks_in_image(masks, boxes, jnp.asarray([True]), im_h=20, im_w=30)
    )
    assert out.shape == (1, 20, 30)
    assert out[0, 8, 9]  # center of box is on
    assert not out[0, 0, 0] and not out[0, 19, 29]
    # invalid instance -> empty
    out2 = np.asarray(
        st.paste_masks_in_image(masks, boxes, jnp.asarray([False]), im_h=20, im_w=30)
    )
    assert not out2.any()


def test_image_batch_padding():
    ims = [np.ones((10, 20, 3), np.float32), np.ones((14, 9, 3), np.float32)]
    batch = st.to_image_batch(ims, size_divisible=32)
    assert batch.tensor.shape == (2, 32, 32, 3)
    assert batch.image_sizes == [(10, 20), (14, 9)]
    assert batch.tensor[1, 13, 8, 0] == 1 and batch.tensor[1, 15, 0, 0] == 0
