"""Profiling harness: per-op timing + jax.profiler traces.

Parity target: ``scripts/run_profiler.py`` (torch.profiler wrapper with
warmup/repeat; note the reference's is stale against its own 0.5 API —
SURVEY §5.1).  This one profiles the current pipeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax

__all__ = ["time_jitted", "trace"]


def time_jitted(
    fn: Callable,
    *args,
    warmup: int = 3,
    iters: int = 20,
    name: Optional[str] = None,
) -> float:
    """Compile, warm up, and time a jittable function.  Returns seconds/iter."""
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    if name:
        print(f"{name}: {dt * 1e3:.3f} ms/iter")
    return dt


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        print(f"trace written to {logdir}")
