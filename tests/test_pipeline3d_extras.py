import jax.numpy as jnp
import numpy as np

from disprcnn_tpu.models.detector.disprcnn3d import (
    remove_illegal_detections,
    remove_low_score_rois,
)
from disprcnn_tpu.structures.boxes3d import (
    corners_from_xyzhwl_ry_velodyne,
    filter_fov_points,
)
from disprcnn_tpu.structures.stereo import StereoBoxes
from disprcnn_tpu.utils.stereo import warp_right_to_left


def _dets(scores, valid=None):
    n = len(scores)
    boxes = jnp.tile(jnp.asarray([[10.0, 10, 50, 50]]), (n, 1))
    return StereoBoxes(
        left=boxes[None], right=boxes[None],
        score=jnp.asarray(scores)[None],
        valid=jnp.asarray(valid if valid is not None else [True] * n)[None],
    )


def test_remove_low_score_keeps_at_least_two():
    d = _dets([0.01, 0.02, 0.03, 0.9])
    out = remove_low_score_rois(d, min_score=0.5, keep_at_least=2)
    v = np.asarray(out.valid[0])
    assert v.sum() == 2  # 0.9 plus the next best 0.03
    assert v[3] and v[2]


def test_remove_illegal_detections():
    boxes = jnp.asarray([[[10.0, 10, 50, 50], [10, 10, 10.2, 50]]])
    d = StereoBoxes(left=boxes, right=boxes, score=jnp.ones((1, 2)),
                    valid=jnp.ones((1, 2), bool))
    out = remove_illegal_detections(d)
    assert bool(out.valid[0, 0]) and not bool(out.valid[0, 1])


def test_velodyne_corners_layout():
    b = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 4.0, 0.0]])
    c = np.asarray(corners_from_xyzhwl_ry_velodyne(b))[0]
    np.testing.assert_allclose(c[0], [-2.0, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(c[1], [-2.0, 0.5, 2.0], atol=1e-6)  # z up by h
    np.testing.assert_allclose(c[4], [-2.0, -0.5, 0.0], atol=1e-6)


def test_filter_fov_points():
    p2 = jnp.asarray([[700.0, 0, 300, 0], [0, 700, 100, 0], [0, 0, 1, 0]])
    pts = jnp.asarray([
        [0.0, 0.0, 10.0],   # center -> inside
        [50.0, 0.0, 10.0],  # projects far right -> outside
        [0.0, 0.0, -5.0],   # behind camera
    ])
    m = np.asarray(filter_fov_points(pts, p2, (600, 200)))
    assert m.tolist() == [True, False, False]


def test_warp_right_to_left_shifts():
    right = jnp.zeros((4, 8, 1)).at[:, 2, 0].set(1.0)
    disp = jnp.full((4, 8), 2.0)
    out = np.asarray(warp_right_to_left(right, disp))
    # left(x) = right(x - 2): the bright column moves from 2 to 4
    assert out[0, 4, 0] == 1.0 and out[0, 2, 0] == 0.0
