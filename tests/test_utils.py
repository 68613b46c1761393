"""Checkpoint round-trip and profiler harness tests."""

import tempfile

import pytest

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


@pytest.mark.slow
def test_cli_save_resume_end_to_end():
    """The flagship CLI must save an orbax checkpoint and resume from it
    (reference parity: train_mlp_nerf.py:114-122,189-199).

    ~86 s (two subprocess train runs) — marked slow; deselect with
    ``-m 'not slow'`` for the fast inner loop (run_dev_checks runs it).
    """
    import os
    import pathlib
    import subprocess
    import sys

    examples = pathlib.Path(__file__).resolve().parents[1] / "examples"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    with tempfile.TemporaryDirectory() as d:
        ckpt = f"{d}/ckpt"
        base = [
            sys.executable, "train_ngp_nerf_occ.py", "--smoke", "--cpu",
            "--model_path", ckpt, "--num_rays", "256",
        ]
        r1 = subprocess.run(
            base + ["--max_steps", "20"],
            cwd=examples, env=env, capture_output=True, text=True,
            timeout=600,
        )
        assert r1.returncode == 0, r1.stderr[-2000:]
        assert latest_step(ckpt) == 20
        r2 = subprocess.run(
            base + ["--max_steps", "25", "--resume"],
            cwd=examples, env=env, capture_output=True, text=True,
            timeout=600,
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert f"resumed from {ckpt} at step 20" in r2.stdout
        assert latest_step(ckpt) == 25


def test_time_jitted():
    dt = time_jitted(lambda x: x * 2 + 1, jnp.ones((128,)), warmup=1, iters=3)
    assert dt > 0


def test_capture_trace_parser(tmp_path, capsys):
    """The device-trace aggregator handles a minimal Chrome-trace layout."""
    import gzip
    import json
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))
    from capture_trace import parse

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    trace = {
        "traceEvents": [
            {"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "pid": 1, "tid": 3, "name": "thread_name",
             "args": {"name": "XLA Ops"}},
            {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.1",
             "dur": 3000, "ts": 0},
            {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.1",
             "dur": 3000, "ts": 10},
            {"ph": "X", "pid": 1, "tid": 3, "name": "copy.2",
             "dur": 1500, "ts": 20},
            # host-side event must be excluded
            {"ph": "M", "pid": 2, "name": "process_name",
             "args": {"name": "/host:CPU"}},
            {"ph": "M", "pid": 2, "tid": 1, "name": "thread_name",
             "args": {"name": "XLA Ops"}},
            {"ph": "X", "pid": 2, "tid": 1, "name": "hostop",
             "dur": 9999, "ts": 0},
        ]
    }
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    parse(str(tmp_path), top=5, steps=3)
    out = capsys.readouterr().out
    assert "total device op time: 2.50 ms/step" in out  # (6000+1500)/1e3/3
    assert "fusion.1" in out and "hostop" not in out


def test_lpips_unconditional():
    """LPIPS runs with no optional installs (reference evaluates LPIPS-vgg
    in every eval loop, train_ngp_nerf_occ.py:146-148); the offline
    fallback must be zero for identical images and monotone in distortion
    strength."""
    from nerfacc_tpu.utils.lpips import lpips

    rng = np.random.RandomState(0)
    a = rng.rand(48, 48, 3).astype(np.float32)
    noise = rng.randn(48, 48, 3).astype(np.float32)
    same, src = lpips(a, a)
    assert src in ("rnd", "vgg")
    small, _ = lpips(a, np.clip(a + 0.05 * noise, 0, 1))
    big, _ = lpips(a, np.clip(a + 0.3 * noise, 0, 1))
    assert same < 1e-6
    assert same < small < big
