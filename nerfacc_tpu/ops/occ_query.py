"""Pallas occupancy-query kernel: VMEM-resident bit-packed grid, no HBM gather.

The problem: grid traversal asks "is the cell containing point p occupied?"
for millions of candidate points per train step.  In XLA that is an HBM
gather at ~7 ns per index on v5e — the dominant traversal cost.  Mosaic has
no arbitrary-index gather either, but it *does* support

  - dynamic slicing along the sublane (second-to-last) axis, and
  - ``take_along_axis`` along the lane axis (a VPU-rate 128-lane gather).

So: bit-pack the binary grid along z into u32 words, lay it out
``(rx, ry * rz/32)`` — x is the sublane axis, (y, z-word) are lanes — keep
the whole thing in VMEM (128^3 bits = 256 KB), and answer queries with a
loop over x-slabs: each iteration dynamic-slices one slab row and resolves
every query whose cell lies in that slab via lane gathers.  Cost is ~2-3
VPU cycles per query *independent of query count per slab*, and zero HBM
traffic after the one-time grid load.

Reference anchor: the CUDA DDA's grid reads (``nerfacc/cuda/csrc/grid.cu:
194-205``); semantics match :func:`nerfacc_tpu.grid._query_soa` for a
single-level grid (the multi-level mip walk falls back to XLA).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_LANE = 128


def bitpack_grid(binaries: Array) -> Array:
    """Pack a ``(rx, ry, rz)`` bool grid into ``(rx, ry * ceil32(rz)/32)``
    u32 words; bit ``b`` of word ``[ix, iy*W + wz]`` is cell
    ``(ix, iy, wz*32+b)``.  The lane axis is zero-padded to a multiple of 128.
    """
    rx, ry, rz = binaries.shape
    rz_pad = -(-rz // 32) * 32
    if rz_pad != rz:
        binaries = jnp.pad(binaries, ((0, 0), (0, 0), (0, rz_pad - rz)))
    w = rz_pad // 32
    bits = binaries.reshape(rx, ry, w, 32).astype(jnp.uint32)
    words = (bits << jnp.arange(32, dtype=jnp.uint32)).sum(
        axis=-1, dtype=jnp.uint32
    )
    words = words.reshape(rx, ry * w)
    wl = ry * w
    wl_pad = -(-wl // _LANE) * _LANE
    if wl_pad != wl:
        words = jnp.pad(words, ((0, 0), (0, wl_pad - wl)))
    return words


def _cellify(p, lo, inv_extent, r):
    """Normalized coord in [-0.5, 0.5) and clipped integer cell."""
    nrm = (p - lo) * inv_extent - 0.5
    cell = jnp.clip(((nrm + 0.5) * r).astype(jnp.int32), 0, r - 1)
    return nrm, cell


def _query_kernel(
    aabb_ref,  # SMEM (8,) f32: [x0,y0,z0, inv_ex,inv_ey,inv_ez, pad, pad]
    grid_ref,  # VMEM (rx, wl) u32 — whole packed grid
    px_ref,
    py_ref,
    pz_ref,  # VMEM (tm, 128) f32 sample blocks
    out_ref,  # VMEM (tm, 128) i32 — 1 if occupied (and inside), else 0
    *,
    rx: int,
    ry: int,
    rz: int,
    words_per_y: int,
    tm: int,
):
    nx, ix = _cellify(px_ref[:], aabb_ref[0], aabb_ref[3], rx)
    ny, iy = _cellify(py_ref[:], aabb_ref[1], aabb_ref[4], ry)
    nz, iz = _cellify(pz_ref[:], aabb_ref[2], aabb_ref[5], rz)
    inside = (
        jnp.maximum(jnp.maximum(jnp.abs(nx), jnp.abs(ny)), jnp.abs(nz)) < 0.5
    )

    word_lane = iy * words_per_y + (iz >> 5)
    lane = word_lane & (_LANE - 1)
    win = word_lane >> 7
    bit = (iz & 31).astype(jnp.uint32)
    n_win = grid_ref.shape[1] // _LANE

    # Only sweep the slab range this block actually touches.
    lo = jnp.min(jnp.where(inside, ix, rx - 1))
    hi = jnp.max(jnp.where(inside, ix, 0))

    def body(i, acc):
        row = grid_ref[i, :]  # (wl,) u32 — dynamic sublane slice
        hit = jnp.zeros((tm, _LANE), jnp.uint32)
        for w in range(n_win):
            vals = jnp.broadcast_to(
                row[w * _LANE : (w + 1) * _LANE][None, :], (tm, _LANE)
            )
            g = jnp.take_along_axis(vals, lane, axis=1)
            hit = jnp.where(win == w, g, hit) if n_win > 1 else g
        occ_bit = (hit >> bit) & jnp.uint32(1)
        return acc | jnp.where(ix == i, occ_bit, jnp.uint32(0))

    acc = jax.lax.fori_loop(
        lo, hi + 1, body, jnp.zeros((tm, _LANE), jnp.uint32)
    )
    out_ref[:] = jnp.where(inside, acc.astype(jnp.int32), 0)


@functools.partial(
    jax.jit, static_argnames=("resolution", "tm", "interpret")
)
def occupancy_query_pallas(
    packed: Array,  # (rx, wl) u32 from bitpack_grid
    aabb: Array,  # (6,) f32 level box
    px: Array,
    py: Array,
    pz: Array,  # any (matching) shape
    *,
    resolution: Tuple[int, int, int],
    tm: int = 32,
    interpret: bool = False,
) -> Array:
    """Occupancy of the cells containing ``(px, py, pz)`` — single level.

    Returns a bool array shaped like ``px``: True iff the point is inside
    ``aabb`` and its cell is occupied (matches ``_query_soa`` at level 0).
    """
    rx, ry, rz = resolution
    w = -(-rz // 32)
    shape = px.shape
    n = int(np.prod(shape)) if shape else 1
    block = tm * _LANE
    n_pad = -(-max(n, 1) // block) * block

    def flat(p):
        p = p.reshape(-1)
        if n_pad != n:
            # Padding lands outside any box at +inf -> masked by `inside`.
            p = jnp.concatenate(
                [p, jnp.full((n_pad - n,), jnp.inf, p.dtype)]
            )
        return p.reshape(n_pad // _LANE, _LANE)

    pxf, pyf, pzf = flat(px), flat(py), flat(pz)
    lo = aabb[:3]
    inv_extent = 1.0 / (aabb[3:] - aabb[:3])
    scal = jnp.concatenate(
        [lo, inv_extent, jnp.zeros((2,), aabb.dtype)]
    ).astype(jnp.float32)

    kernel = functools.partial(
        _query_kernel, rx=rx, ry=ry, rz=rz, words_per_y=w, tm=tm
    )
    grid = n_pad // block
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tm, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((tm, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((tm, _LANE), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tm, _LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), jnp.int32),
        interpret=interpret,
    )(scal, packed, pxf, pyf, pzf)
    return out.reshape(-1)[:n].reshape(shape).astype(bool)


def occupancy_query_ref(
    binaries_lvl: Array, aabb: Array, px: Array, py: Array, pz: Array
) -> Array:
    """Pure-jnp oracle with identical semantics (single-level ``_query_soa``)."""
    rx, ry, rz = binaries_lvl.shape
    nx = (px - aabb[0]) / (aabb[3] - aabb[0]) - 0.5
    ny = (py - aabb[1]) / (aabb[4] - aabb[1]) - 0.5
    nz = (pz - aabb[2]) / (aabb[5] - aabb[2]) - 0.5
    inside = (
        jnp.maximum(jnp.maximum(jnp.abs(nx), jnp.abs(ny)), jnp.abs(nz)) < 0.5
    )
    ix = jnp.clip(((nx + 0.5) * rx).astype(jnp.int32), 0, rx - 1)
    iy = jnp.clip(((ny + 0.5) * ry).astype(jnp.int32), 0, ry - 1)
    iz = jnp.clip(((nz + 0.5) * rz).astype(jnp.int32), 0, rz - 1)
    flat = binaries_lvl.reshape(-1)
    vals = jnp.take(flat, (ix * ry + iy) * rz + iz)
    return vals & inside
