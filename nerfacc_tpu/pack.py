"""Packing helpers: ray_indices <-> packed_info, dense <-> flat conversion.

Parity target: ``nerfacc/pack.py`` (``pack_info``), plus TPU-native helpers for
moving between the dense ``(n_rays, n_samples)`` layout and the flat layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = [
    "pack_info",
    "flatten_batched",
    "compact_flat",
    "compact_indices_from_counts",
]


def pack_info(
    ray_indices: Array,
    n_rays: int,
    is_valid: Optional[Array] = None,
) -> Array:
    """``(n_rays, 2)`` (chunk_start, chunk_cnt) from sorted ``ray_indices``.

    Mirrors ``nerfacc.pack_info`` (``nerfacc/pack.py:11-49``: index_add count +
    cumsum).  ``n_rays`` must be static under jit.  If ``is_valid`` is given,
    counts only valid samples (capacity-layout extension); chunk_start still
    points at the first slot of the ray's region.
    """
    assert ray_indices.ndim == 1
    ones = jnp.ones_like(ray_indices, dtype=jnp.int32)
    if is_valid is not None:
        ones = ones * is_valid.astype(jnp.int32)
    cnts = jax.ops.segment_sum(ones, ray_indices, num_segments=n_rays)
    starts = jnp.cumsum(cnts) - cnts
    if is_valid is not None:
        # Region starts count every slot, valid or not.
        all_cnts = jax.ops.segment_sum(
            jnp.ones_like(ray_indices, dtype=jnp.int32),
            ray_indices,
            num_segments=n_rays,
        )
        starts = jnp.cumsum(all_cnts) - all_cnts
    return jnp.stack([starts, cnts], axis=-1)


def flatten_batched(*vals: Array) -> Tuple:
    """Flatten batched ``(n_rays, S)`` arrays to flat ``(n_rays*S,)`` plus
    row-major ``ray_indices``.  Returns ``(*flat_vals, ray_indices)``."""
    n_rays, s = vals[0].shape[:2]
    ray_indices = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), s)
    flat = tuple(v.reshape((n_rays * s,) + v.shape[2:]) for v in vals)
    return flat + (ray_indices,)


def compact_flat(
    is_valid: Array,
    capacity: int,
) -> Tuple[Array, Array]:
    """Gather indices that compact valid flat samples to a static ``capacity``.

    The expensive radiance field should only run on valid samples.  With static
    shapes we cannot drop invalid slots, but we can *compact*: a stable argsort
    on ``~is_valid`` moves all valid samples to the front; the first
    ``capacity`` slots are then processed densely.  Returns
    ``(gather_idx (capacity,), kept_mask (capacity,))`` where ``kept_mask``
    marks slots that hold a real valid sample.  Scatter results back with
    ``out = zeros(N).at[gather_idx].set(res * kept_mask)``.

    This is the TPU answer to the reference's exact-packing economics
    (``nerfacc/cuda/csrc/grid.cu:405-471`` two-pass allocation).
    """
    order = jnp.argsort(~is_valid, stable=True)
    gather_idx = order[:capacity]
    n_valid = jnp.sum(is_valid.astype(jnp.int32))
    kept = jnp.arange(capacity, dtype=jnp.int32) < n_valid
    return gather_idx, kept


def compact_indices_from_counts(
    num_valid: Array, row_capacity: int, capacity: int
) -> Tuple[Array, Array, Array]:
    """Sort-free compaction for row-prefix-valid layouts.

    The traversal writes each ray's valid samples as a *prefix* of its row
    (``grid.py`` stage-2 compaction), so the flat row-major array is
    "blocks with valid prefixes".  Compacting it to ``capacity`` slots needs
    no sort — just count arithmetic:

    output slot ``k`` holds row ``r = searchsorted(cum, k, right) - 1`` at
    offset ``j = k - cum[r]``, i.e. flat source ``r * row_capacity + j``.

    Returns ``(gather_idx (capacity,), ray_ids (capacity,), kept (capacity,))``.
    ``kept`` masks slots beyond the total valid count; overflowing samples
    (total > capacity) are dropped from the back.  This is the vectorized
    equivalent of the CUDA two-pass exact allocation (``grid.cu:405-471``)
    under a static output budget.
    """
    cnt = num_valid.astype(jnp.int32)
    cum = jnp.cumsum(cnt) - cnt  # exclusive: output start per row
    total = cum[-1] + cnt[-1]
    k = jnp.arange(capacity, dtype=jnp.int32)
    r = jnp.searchsorted(cum, k, side="right").astype(jnp.int32) - 1
    r = jnp.clip(r, 0, num_valid.shape[0] - 1)
    j = k - cum[r]
    gather_idx = r * row_capacity + jnp.clip(j, 0, row_capacity - 1)
    kept = k < total
    return gather_idx, r, kept
