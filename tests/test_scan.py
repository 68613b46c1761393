"""Scan tests — port of the reference's tests/test_scan.py strategy:
batched cumsum/cumprod oracle vs the packed/flat segmented path on identical
data, for outputs and gradients, plus the docstring golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.scan import (
    exclusive_prod,
    exclusive_sum,
    inclusive_prod,
    inclusive_sum,
)


def _packed_info_rows(n_rows, n_cols):
    starts = np.arange(n_rows) * n_cols
    cnts = np.full((n_rows,), n_cols)
    return jnp.asarray(np.stack([starts, cnts], axis=-1), dtype=jnp.int32)


GOLDEN_INPUTS = jnp.asarray([1.0, 2, 3, 4, 5, 6, 7, 8, 9])
GOLDEN_PACKED = jnp.asarray([[0, 2], [2, 3], [5, 4]], dtype=jnp.int32)


def test_golden_values():
    # Docstring goldens from nerfacc/scan.py.
    np.testing.assert_allclose(
        inclusive_sum(GOLDEN_INPUTS, GOLDEN_PACKED),
        [1, 3, 3, 7, 12, 6, 13, 21, 30],
    )
    np.testing.assert_allclose(
        exclusive_sum(GOLDEN_INPUTS, GOLDEN_PACKED),
        [0, 1, 0, 3, 7, 0, 6, 13, 21],
    )
    np.testing.assert_allclose(
        inclusive_prod(GOLDEN_INPUTS, GOLDEN_PACKED),
        [1, 2, 3, 12, 60, 6, 42, 336, 3024],
    )
    np.testing.assert_allclose(
        exclusive_prod(GOLDEN_INPUTS, GOLDEN_PACKED),
        [1, 1, 1, 3, 12, 1, 6, 42, 336],
    )


@pytest.mark.parametrize(
    "fn", [inclusive_sum, exclusive_sum, inclusive_prod, exclusive_prod]
)
def test_flat_matches_batched(fn):
    rng = np.random.default_rng(42)
    data = jnp.asarray(rng.random((5, 1000), dtype=np.float32))
    packed_info = _packed_info_rows(5, 1000)

    out1, grad1 = jax.value_and_grad(lambda x: fn(x).sum())(data)
    flat = data.reshape(-1)
    out2, grad2 = jax.value_and_grad(
        lambda x: fn(x, packed_info).sum()
    )(flat)

    np.testing.assert_allclose(out1, out2, atol=3e-4, rtol=1e-5)
    np.testing.assert_allclose(
        grad1.reshape(-1), grad2, atol=3e-4, rtol=1e-4
    )


@pytest.mark.parametrize(
    "fn", [inclusive_sum, exclusive_sum, inclusive_prod, exclusive_prod]
)
def test_ray_indices_matches_packed(fn):
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((37,), dtype=np.float32))
    cnts = np.array([5, 0, 12, 3, 17])
    starts = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    packed_info = jnp.asarray(np.stack([starts, cnts], -1), jnp.int32)
    ray_indices = jnp.asarray(np.repeat(np.arange(5), cnts), jnp.int32)

    np.testing.assert_allclose(
        fn(data, packed_info=packed_info),
        fn(data, ray_indices=ray_indices),
        rtol=1e-6,
    )


def test_prod_grad_at_zero_is_correct():
    # The reference CUDA backward is wrong at zeros (scan.cu:209 FIXME);
    # autodiff through the segmented scan is exact — check vs finite math.
    x = jnp.asarray([0.5, 0.0, 2.0])
    packed = jnp.asarray([[0, 3]], jnp.int32)
    grad = jax.grad(lambda v: inclusive_prod(v, packed).sum())(x)
    # y = [x0, x0*x1, x0*x1*x2]; d/dx1 = x0 + x0*x2 = 0.5 + 1.0
    np.testing.assert_allclose(grad, [1.0 + 0.0 + 0.0, 0.5 + 1.0, 0.0])
