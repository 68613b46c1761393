"""Checkpoint round-trip and profiler harness tests."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.utils import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
    time_jitted,
)


def test_checkpoint_roundtrip():
    state = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4)},
        "step_stats": jnp.asarray([1, 2, 3]),
    }
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, state, step=120)
        assert latest_step(d) == 120
        restored, step = restore_checkpoint(d, state)
        assert step == 120
        np.testing.assert_array_equal(
            restored["params"]["w"], state["params"]["w"]
        )
        np.testing.assert_array_equal(
            restored["step_stats"], state["step_stats"]
        )
        # newer checkpoint wins
        state2 = jax.tree.map(lambda x: x + 1, state)
        save_checkpoint(d, state2, step=240)
        restored2, step2 = restore_checkpoint(d, state2)
        assert step2 == 240
        np.testing.assert_array_equal(
            restored2["params"]["b"], state["params"]["b"] + 1
        )


def test_checkpoint_missing_raises():
    import pytest

    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(FileNotFoundError):
            restore_checkpoint(d, {})


def test_time_jitted():
    dt = time_jitted(lambda x: x * 2 + 1, jnp.ones((128,)), warmup=1, iters=3)
    assert dt > 0
