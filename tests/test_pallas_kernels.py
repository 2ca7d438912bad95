import jax
import jax.numpy as jnp
import numpy as np

from disprcnn_tpu.ops.pallas.fps import furthest_point_sample_pallas
from disprcnn_tpu.ops.points import furthest_point_sample


def test_pallas_fps_matches_xla(rng):
    pts = jnp.asarray(rng.uniform(-5, 5, (10, 64, 3)).astype(np.float32))
    got = furthest_point_sample_pallas(pts, 16, interpret=True)
    want = furthest_point_sample(pts, 16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_fps_npoint_exceeds_n(rng):
    pts = jnp.asarray(rng.uniform(-5, 5, (3, 32, 3)).astype(np.float32))
    got = furthest_point_sample_pallas(pts, 48, interpret=True)
    want = furthest_point_sample(pts, 48)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
