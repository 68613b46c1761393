"""Port of tests/test_camera.py — round-trip property:
distort(undistort(x)) ~= x."""

import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.cameras import (
    _opencv_lens_distortion,
    _opencv_lens_distortion_fisheye,
    opencv_lens_undistortion,
    opencv_lens_undistortion_fisheye,
)


def test_opencv_lens_undistortion_roundtrip():
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.random((3, 1000, 2), dtype=np.float32))

    params = jnp.asarray(rng.random(8, dtype=np.float32) * 0.01)
    x_undistort = opencv_lens_undistortion(x, params, 1e-5, 10)
    x_distort = _opencv_lens_distortion(
        x_undistort, jnp.broadcast_to(params, x.shape[:-1] + (8,))
    )
    np.testing.assert_allclose(x, x_distort, atol=1e-5)


def test_opencv_lens_undistortion_partial_params():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((100, 2), dtype=np.float32))
    for n in (0, 1, 2, 4):
        params = jnp.asarray(rng.random(n, dtype=np.float32) * 0.01)
        out = opencv_lens_undistortion(x, params, 1e-5, 10)
        assert out.shape == x.shape
        full = jnp.zeros((8,)).at[:n].set(params)
        x_distort = _opencv_lens_distortion(
            out, jnp.broadcast_to(full, x.shape[:-1] + (8,))
        )
        np.testing.assert_allclose(x, x_distort, atol=1e-5)


def test_opencv_lens_undistortion_fisheye_roundtrip():
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.random((3, 1000, 2), dtype=np.float32))
    params = jnp.asarray(rng.random(4, dtype=np.float32) * 0.01)
    x_undistort = opencv_lens_undistortion_fisheye(x, params, 1e-5, 10)
    x_distort = _opencv_lens_distortion_fisheye(
        x_undistort, jnp.broadcast_to(params, x.shape[:-1] + (4,))
    )
    np.testing.assert_allclose(x, x_distort, atol=1e-5)
