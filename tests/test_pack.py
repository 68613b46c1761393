"""Port of tests/test_pack.py — golden packed_info."""

import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.pack import pack_info


def test_pack_info():
    ray_indices = jnp.asarray([0, 0, 1, 1, 1, 2, 2, 2, 2], jnp.int32)
    out = pack_info(ray_indices, n_rays=3)
    np.testing.assert_array_equal(out, [[0, 2], [2, 3], [5, 4]])


def test_pack_info_with_validity():
    ray_indices = jnp.asarray([0, 0, 1, 1, 1, 2], jnp.int32)
    is_valid = jnp.asarray([True, False, True, True, False, True])
    out = pack_info(ray_indices, n_rays=3, is_valid=is_valid)
    np.testing.assert_array_equal(out[:, 1], [1, 2, 1])
    np.testing.assert_array_equal(out[:, 0], [0, 2, 5])
