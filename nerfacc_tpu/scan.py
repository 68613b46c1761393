"""Segmented inclusive/exclusive sum & prod scans.

Parity target: ``nerfacc/scan.py`` (API) and ``nerfacc/cuda/csrc/scan.cu``
(packed CUDA kernels).  The reference dispatches between a batched
``torch.cumsum``/``cumprod`` path and custom per-chunk CUDA block scans.

TPU design: the batched path is a plain ``jnp.cumsum``/``cumprod`` along the
last axis (XLA lowers this to an efficient parallel scan).  The flat/packed
path is a *segmented* scan built on ``jax.lax.associative_scan`` with
segment-start flags — exact per segment (no cross-segment accumulation error,
unlike the subtract-prefix trick), log-depth, and fully differentiable via
JAX autodiff, so the reference's hand-written backward kernels (reverse scans,
``scan.cu:41-51``) are unnecessary; XLA derives the same reverse-scan adjoint.

Note on grads at zero: the reference's ``exclusive_prod`` backward divides by
the input and is wrong at 0 (``scan.cu:209`` FIXME).  Here autodiff through
the scan graph gives *correct* product-rule gradients everywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

__all__ = [
    "inclusive_sum",
    "exclusive_sum",
    "inclusive_prod",
    "exclusive_prod",
]


# ---------------------------------------------------------------------------
# Segment-flag helpers
# ---------------------------------------------------------------------------


def flags_from_ray_indices(ray_indices: Array) -> Array:
    """Segment-start flags from sorted (row-major) ray indices."""
    head = jnp.ones((1,), dtype=bool)
    if ray_indices.shape[0] <= 1:
        return head[: ray_indices.shape[0]]
    return jnp.concatenate([head, ray_indices[1:] != ray_indices[:-1]])


def flags_from_packed_info(packed_info: Array, n: int) -> Array:
    """Segment-start flags from ``(n_rays, 2)`` (start, count) chunk table."""
    starts = packed_info[:, 0]
    cnts = packed_info[:, 1]
    # Chunks with zero count have no element to flag; scatter with drop-mode.
    idx = jnp.where(cnts > 0, starts, n)
    flags = jnp.zeros((n,), dtype=bool).at[idx].set(True, mode="drop")
    return flags.at[0].set(True)


def _end_flags(flags: Array) -> Array:
    """Segment-end flags (the mirror of start flags)."""
    tail = jnp.ones((1,), dtype=bool)
    if flags.shape[0] <= 1:
        return tail[: flags.shape[0]]
    return jnp.concatenate([flags[1:], tail])


# ---------------------------------------------------------------------------
# Segmented scans (flat layout)
# ---------------------------------------------------------------------------


def _seg_combine(op):
    def combine(a, b):
        fa, xa = a
        fb, xb = b
        return fa | fb, jnp.where(fb, xb, op(xa, xb))

    return combine


_BLOCK = 128


def _seg_scan(x: Array, flags: Array, op, reverse: bool = False) -> Array:
    """Inclusive segmented scan with the classic (flag, value) monoid.

    Implemented as a blocked two-level scan: ``associative_scan`` along a
    static 128-wide axis (graph depth log2(128), independent of N) plus a
    recursive cross-block carry — the XLA-friendly analogue of the CUDA
    up/down-sweep block scan (``utils_scan.cuh:21-263``).  Exact per segment;
    no cross-segment accumulation error.
    """
    if reverse:
        return _seg_scan(x[::-1], _end_flags(flags)[::-1], op)[::-1]

    identity = jnp.asarray(1 if op is jnp.multiply else 0, x.dtype)
    combine = _seg_combine(op)

    n = x.shape[0]
    if n <= _BLOCK:
        _, out = lax.associative_scan(combine, (flags, x))
        return out

    b = -(-n // _BLOCK)
    pad = b * _BLOCK - n
    # Padding elements start their own segments so they never leak carries.
    xp = jnp.concatenate([x, jnp.full((pad,), identity, x.dtype)])
    fp = jnp.concatenate([flags, jnp.ones((pad,), bool)])
    x2 = xp.reshape(b, _BLOCK)
    f2 = fp.reshape(b, _BLOCK)

    _, inner = lax.associative_scan(combine, (f2, x2), axis=1)

    # Cross-block carry: each block collapses to (has_flag, end_value) and the
    # carry chain is the same segmented scan one level up.
    block_tot = inner[:, -1]
    block_flag = jnp.any(f2, axis=1)
    block_run = _seg_scan(block_tot, block_flag, op)
    carry_in = jnp.concatenate([identity[None], block_run[:-1]])

    # The carry applies only to positions before the first flag in the block.
    seen_flag = jnp.cumsum(f2.astype(jnp.int32), axis=1) > 0
    out = jnp.where(seen_flag, inner, op(carry_in[:, None], inner))
    return out.reshape(-1)[:n]


def _float0_zeros(x: Array):
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# The adjoint of a (segmented) inclusive sum is the *reverse* (segmented)
# inclusive sum of the cotangent (what the CUDA backward computes by running
# the same kernel through reverse iterators, scan.cu:41-51).  Hand-writing
# the VJP avoids transposing the associative_scan graph — much cheaper to
# compile and exactly two scan passes at runtime.


@jax.custom_vjp
def seg_inclusive_sum(x: Array, flags: Array) -> Array:
    return _seg_scan(x, flags, jnp.add)


def _seg_inc_sum_fwd(x, flags):
    return seg_inclusive_sum(x, flags), flags


def _seg_inc_sum_bwd(flags, g):
    return _seg_scan(g, flags, jnp.add, reverse=True), _float0_zeros(flags)


seg_inclusive_sum.defvjp(_seg_inc_sum_fwd, _seg_inc_sum_bwd)


def _seg_exclusive_sum_impl(x: Array, flags: Array, reverse: bool = False) -> Array:
    if reverse:
        return _seg_exclusive_sum_impl(x[::-1], _end_flags(flags)[::-1])[::-1]
    inc = _seg_scan(x, flags, jnp.add)
    shifted = jnp.concatenate([jnp.zeros_like(inc[:1]), inc[:-1]])
    return jnp.where(flags, jnp.zeros_like(x), shifted)


@jax.custom_vjp
def seg_exclusive_sum(x: Array, flags: Array) -> Array:
    return _seg_exclusive_sum_impl(x, flags)


def _seg_exc_sum_fwd(x, flags):
    return seg_exclusive_sum(x, flags), flags


def _seg_exc_sum_bwd(flags, g):
    return _seg_exclusive_sum_impl(g, flags, reverse=True), _float0_zeros(flags)


seg_exclusive_sum.defvjp(_seg_exc_sum_fwd, _seg_exc_sum_bwd)


def seg_inclusive_prod(x: Array, flags: Array) -> Array:
    return _seg_scan(x, flags, jnp.multiply)


def seg_exclusive_prod(x: Array, flags: Array) -> Array:
    inc = seg_inclusive_prod(x, flags)
    shifted = jnp.concatenate([jnp.ones_like(inc[:1]), inc[:-1]])
    return jnp.where(flags, jnp.ones_like(x), shifted)


def _resolve_flags(
    inputs: Array,
    packed_info: Optional[Array],
    ray_indices: Optional[Array],
) -> Array:
    assert inputs.ndim == 1, "flat scans require 1-D inputs"
    if ray_indices is not None:
        return flags_from_ray_indices(ray_indices)
    assert packed_info is not None
    assert packed_info.ndim == 2 and packed_info.shape[-1] == 2
    return flags_from_packed_info(packed_info, inputs.shape[0])


# ---------------------------------------------------------------------------
# Public API (mirrors nerfacc/scan.py signatures)
# ---------------------------------------------------------------------------


def inclusive_sum(
    inputs: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
) -> Array:
    """Inclusive sum over the last axis, or over flat per-ray chunks.

    Equivalent to ``nerfacc.inclusive_sum`` (``nerfacc/scan.py:12``); also
    accepts ``ray_indices`` directly (sorted) as the segment descriptor.
    """
    if packed_info is None and ray_indices is None:
        return jnp.cumsum(inputs, axis=-1)
    return seg_inclusive_sum(inputs, _resolve_flags(inputs, packed_info, ray_indices))


def exclusive_sum(
    inputs: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
) -> Array:
    """Exclusive sum; see ``nerfacc/scan.py:58``."""
    if packed_info is None and ray_indices is None:
        shifted = jnp.concatenate(
            [jnp.zeros_like(inputs[..., :1]), inputs[..., :-1]], axis=-1
        )
        return jnp.cumsum(shifted, axis=-1)
    return seg_exclusive_sum(inputs, _resolve_flags(inputs, packed_info, ray_indices))


def inclusive_prod(
    inputs: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
) -> Array:
    """Inclusive product; see ``nerfacc/scan.py:104``."""
    if packed_info is None and ray_indices is None:
        return jnp.cumprod(inputs, axis=-1)
    return seg_inclusive_prod(inputs, _resolve_flags(inputs, packed_info, ray_indices))


def exclusive_prod(
    inputs: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
) -> Array:
    """Exclusive product; see ``nerfacc/scan.py:148``."""
    if packed_info is None and ray_indices is None:
        shifted = jnp.concatenate(
            [jnp.ones_like(inputs[..., :1]), inputs[..., :-1]], axis=-1
        )
        return jnp.cumprod(shifted, axis=-1)
    return seg_exclusive_prod(inputs, _resolve_flags(inputs, packed_info, ray_indices))
