"""Ray-segment data containers (TPU-native, static shapes).

Parity target: ``nerfacc/data_specs.py:12-181`` (``RaySamples`` / ``RayIntervals``).

The reference marshals ragged per-ray sample chunks to C++ via a
``RaySegmentsSpec``.  On TPU every shape must be static, so these containers
support two *static-shape* layouts:

- **batched**: ``vals`` has shape ``(n_rays, n_samples)``; segment identity is
  the row index; no auxiliary fields are needed (mirrors the reference's
  batched mode).
- **flat**: ``vals`` has shape ``(all_samples,)`` with ``ray_indices`` (sorted,
  row-major) and optionally ``packed_info`` / ``is_valid``.  Unlike CUDA, the
  flat length is a *capacity* — invalid slots are marked by ``is_valid`` (the
  reference itself threads ``is_valid`` through its over-allocate mode,
  ``data_specs.py:46``), so "packed" here means "flat + mask".

Both are registered JAX pytrees and can be passed through ``jit`` freely.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


@struct.dataclass
class RaySamples:
    """Samples along rays; batched ``(n_rays, n_samples)`` or flat ``(N,)``.

    Attributes:
        vals: sample positions (t midpoints).
        packed_info: optional ``(n_rays, 2)`` int32 (chunk_start, chunk_cnt)
            describing flat chunks (computed over *valid* samples).
        ray_indices: optional ``(all_samples,)`` int32 row index per flat sample.
        is_valid: optional bool mask, same shape as ``vals``.
    """

    vals: Array
    packed_info: Optional[Array] = None
    ray_indices: Optional[Array] = None
    is_valid: Optional[Array] = None

    @property
    def is_batched(self) -> bool:
        return self.vals.ndim > 1


@struct.dataclass
class RayIntervals:
    """Interval edges along rays; batched ``(n_rays, n_edges)`` or flat ``(N,)``.

    ``is_left`` / ``is_right`` indicate whether each edge is the left/right
    boundary of some sample interval (an interior edge shared by two contiguous
    samples is both).  In batched mode they may be ``None`` (all interior edges
    are shared, as in the reference's batched mode).
    """

    vals: Array
    packed_info: Optional[Array] = None
    ray_indices: Optional[Array] = None
    is_left: Optional[Array] = None
    is_right: Optional[Array] = None

    @property
    def is_batched(self) -> bool:
        return self.vals.ndim > 1
