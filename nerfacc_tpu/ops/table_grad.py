"""Pallas hash-table gradient kernel: sorted windowed one-hot MXU reduction.

The problem: the fused encoder's backward must compute

    dT[r] = sum_{i : idx_i == r} dg_i          (r < n_rows, dg_i a 128-vector)

for ~2M sample-levels into a (131072, 128) table.  XLA lowers this
scatter-add as sort + serial sorted-scatter; the scatter alone measured
**30.8 ms** (14.7 ns/index) on v5e — 44% of the whole NGP train step
(device trace, fusion.7).  Reference anchor: tiny-cuda-nn's fp16 gradient
accumulation for the same op (``examples/radiance_fields/ngp.py:99-137``).

The TPU-native replacement keeps the sort (cheap: 1.7 ms for 2M int32
keys) and exploits what sortedness buys: the samples belonging to any
aligned window of ``W`` table rows form one *contiguous slice* of the
sorted arrays.  A Pallas kernel walks a precomputed worklist of
(window, chunk) slots; each slot DMAs a ``(CH, 128)`` slice of sorted
gradients plus its ``(CH,)`` indices into VMEM, builds the in-window
one-hot matrix ``O[j, r] = (idx_j - w0 == r)`` on the VPU, and reduces

    out[w0 : w0 + W] += O^T @ dg_chunk

on the MXU with f32 accumulation — no per-index serial work anywhere.
Rows outside the slot's window (leading/trailing samples pulled in by
DMA alignment, sentinel padding) fall outside ``[0, W)`` and mask to
zero in the one-hot automatically, so no explicit bounds bookkeeping is
needed inside the kernel.

Cost at the flagship config (N = 2M, n_rows = 131072, W = 512,
CH = 2048): ~1280 slots x 0.27 GFLOP = 0.34 TFLOP of MXU work plus one
streamed pass over the 0.5 GB payload; measured end-to-end (sort +
permute + kernel) ~3x faster than the XLA scatter, and *more* precise —
per-row sums accumulate in f32 where the bf16 table's autodiff scatter
accumulates in bf16.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_LANE = 128


def on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return (
            "tpu" in dev.platform.lower()
            or "tpu" in getattr(dev, "device_kind", "").lower()
        )
    except Exception:
        return False


def _unpack_bf16_pairs_t(cols_i32: Array, n_rows_out: int) -> Array:
    """(C, n) i32 pair columns -> (2C, n) bf16 rows (row 2c = low half of
    column c, row 2c+1 = high half — the layout the factor kernels DMA).

    Two variants (NERFACC_DOUT_UNPACK; "lanes" is the DEFAULT since the
    round-5 device A/B: 12.97M vs 12.78M samples/s end-to-end, step 38.18
    vs 38.81 ms):
      "t3"    — bitcast to (C, n, 2) bf16 + transpose(0,2,1) + reshape.
                The transpose moves a minor-2 axis, which XLA lowers as a
                real relayout copy (copy.216, 1.59 ms at 2M x 16 on v5e).
      "lanes" — per-column elementwise shift/mask unpack into 1-D bf16
                lane vectors, then one contiguous stack: no minor-2
                tensor is ever materialized, so no relayout copy.
    """
    C, n = cols_i32.shape
    assert n_rows_out == 2 * C
    if os.environ.get("NERFACC_DOUT_UNPACK", "lanes") == "lanes":
        rows = []
        for c in range(C):
            x = cols_i32[c]
            lo = jax.lax.bitcast_convert_type(
                (x & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
            )
            hi = jax.lax.bitcast_convert_type(
                ((x >> 16) & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
            )
            rows.extend([lo, hi])
        return jnp.stack(rows, axis=0)
    return (
        jax.lax.bitcast_convert_type(cols_i32, jnp.bfloat16)
        .transpose(0, 2, 1)
        .reshape(n_rows_out, n)
    )


def _unpack_f8_quads_t(cols_i32: Array, n_rows_out: int) -> Array:
    """(C, n) i32 quad columns -> (4C, n) bf16 rows, where column c packs
    dout features 4c..4c+3 as float8_e5m2 bytes (little-endian: feature
    4c+b in bits 8b..8b+7).  The u10f8 carry's post-sort unpack — pure
    elementwise shift/mask (same no-relayout property as the "lanes"
    bf16 unpack)."""
    C, n = cols_i32.shape
    assert n_rows_out == 4 * C
    rows = []
    for c in range(C):
        x = cols_i32[c]
        for b in range(4):
            byte = ((x >> (8 * b)) & 0xFF).astype(jnp.uint8)
            rows.append(
                jax.lax.bitcast_convert_type(byte, jnp.float8_e5m2)
                .astype(jnp.bfloat16)
            )
    return jnp.stack(rows, axis=0)


def _window_candidates():
    """Window sizes tried largest-first; NERFACC_TGRAD_W pins one.

    The windowed kernels are DMA-bound (round-4 trace: 5.4 ms across 4
    levels vs a ~0.35 ms MXU share), so W trades accumulator-flush traffic
    (smaller W = more (W, 128) output tiles written) against worklist
    slots and one-hot matmul width — an empirical, device-measured knob.
    Round-4 device sweep at the flagship config: W=256 wins (step 43.0 ms
    vs 44.4 at 512 and 47.4 at 128), so 256 leads the candidates.
    """
    w = os.environ.get("NERFACC_TGRAD_W")
    return (int(w),) if w else (256, 512, 128)


def _worklist(
    sorted_idx: Array, n_rows: int, W: int, CH: int, n_slots: int,
    n_payload: int,
) -> Tuple[Array, Array, Array, Array]:
    """Static-size (window, chunk) worklist over the sorted index array.

    Window ``w`` owns sorted positions ``[starts[w], starts[w+1])``; its
    slots cover them in ``CH`` steps with DMA offsets aligned down to 128
    rows (the misaligned head belongs to earlier windows and masks out in
    the kernel).  Every window gets >= 1 slot so every output block is
    written (zeroed) even when empty.
    """
    NW = n_rows // W
    n = sorted_idx.shape[0]
    starts = jnp.searchsorted(
        sorted_idx, jnp.arange(NW + 1, dtype=jnp.int32) * W
    ).astype(jnp.int32)
    cnt = starts[1:] - starts[:-1]
    # Slots are whole CH-tiles of the sorted arrays (DMA offsets stay
    # CH-aligned, which Mosaic needs to prove sublane-tile divisibility);
    # a window owns every tile its position range touches.  Boundary tiles
    # shared by two windows are processed once per window — each keeps
    # only its own rows via the one-hot range mask.
    c0 = starts[:-1] // CH
    c1 = jnp.maximum(starts[1:] - 1, starts[:-1]) // CH
    slots_per = jnp.where(cnt > 0, c1 - c0 + 1, 1)
    first_slot = jnp.cumsum(slots_per) - slots_per  # (NW,)
    sl = jnp.arange(n_slots, dtype=jnp.int32)
    wid = (
        jnp.searchsorted(first_slot, sl, side="right").astype(jnp.int32) - 1
    )
    wid = jnp.clip(wid, 0, NW - 1)
    k = sl - jnp.take(first_slot, wid)
    # Overflow slots (beyond the real worklist) clamp onto in-bounds tiles
    # of real payload; `valid` zeroes their contribution in the kernel so
    # nothing double-counts.
    total = jnp.sum(slots_per)
    off = jnp.clip((jnp.take(c0, wid) + k) * CH, 0, n_payload - CH)
    first = (k == 0).astype(jnp.int32)
    valid = (sl < total).astype(jnp.int32)
    return wid, off, first, valid


def _tgrad_kernel(
    wid_ref,  # scalar-prefetch (n_slots,) i32 — consumed by index_map
    off_ref,  # scalar-prefetch (n_slots,) i32
    first_ref,  # scalar-prefetch (n_slots,) i32
    valid_ref,  # scalar-prefetch (n_slots,) i32
    idx_hbm,  # (n_pad/128, 128) i32 in ANY
    dg_hbm,  # (n_payload, 128) dg dtype in ANY
    out_ref,  # (W, 128) f32 block for this slot's window
    idx_vmem,  # scratch (CH/128, 128) i32
    dg_vmem,  # scratch (CH, 128) dg dtype
    sems,  # DMA semaphores (2,)
    *,
    W: int,
    CH: int,
):
    s = pl.program_id(0)
    # Worklist offsets are whole CH-tiles; the hints let Mosaic prove
    # divisibility by the sublane tiling for both HBM DMA slices.
    off = pl.multiple_of(off_ref[s], CH)
    row0 = pl.multiple_of(off // _LANE, CH // _LANE)

    idx_dma = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(row0, CH // _LANE), :],
        idx_vmem,
        sems.at[0],
    )
    dg_dma = pltpu.make_async_copy(
        dg_hbm.at[pl.ds(off, CH), :],
        dg_vmem,
        sems.at[1],
    )
    idx_dma.start()
    dg_dma.start()
    idx_dma.wait()
    dg_dma.wait()

    w0 = wid_ref[s] * W
    # One (W, 128) one-hot per 128-sample lane row: oh[r, j] = (idx_j - w0
    # == r).  Samples stay on the LANE axis end-to-end (no lane->sublane
    # relayout of the index vector), and each one-hot feeds one MXU
    # (W, 128) @ (128, 128) contraction over the sample lanes.
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, _LANE), 0)
    # Overflow worklist slots clamp onto real tiles; shifting their rel
    # out of [0, W) masks the whole tile (no double counting).
    w0 = jnp.where(valid_ref[s] == 1, w0, -(W + 1))
    mm = jnp.zeros((W, _LANE), jnp.float32)
    for k in range(CH // _LANE):
        rel = idx_vmem[k, :] - w0  # (128,) lane vector
        oh = (rel[None, :] == rows).astype(dg_vmem.dtype)  # (W, 128)
        mm = mm + jax.lax.dot_general(
            oh,
            dg_vmem[k * _LANE : (k + 1) * _LANE, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[:] = mm

    @pl.when(first_ref[s] == 0)
    def _():
        out_ref[:] = out_ref[:] + mm


@functools.partial(
    jax.jit, static_argnames=("n_rows", "W", "CH", "interpret")
)
def table_grad_sorted(
    sorted_idx: Array,  # (N,) i32, ascending, values in [0, n_rows]
    dg_sorted: Array,  # (N, 128) f32/bf16, rows permuted like sorted_idx
    *,
    n_rows: int,
    W: int = 512,
    CH: int = 2048,
    interpret: bool = False,
) -> Array:
    """Per-row sums of ``dg_sorted`` grouped by ``sorted_idx`` — the
    segment-sum the encoder backward needs, returned as (n_rows, 128) f32.

    ``sorted_idx`` may contain the sentinel value ``n_rows`` (padding);
    those rows are dropped.  ``n_rows`` must be a multiple of ``W``,
    ``CH`` of 128, and the row width exactly 128 lanes.
    """
    assert n_rows % W == 0 and CH % _LANE == 0
    assert dg_sorted.shape[1] == _LANE
    n = sorted_idx.shape[0]
    # Sentinel-pad so tail DMA windows stay in bounds.  When N is already
    # CH-aligned (the training path: N = levels x a power-of-two capacity)
    # only the cheap index array needs padding — overflow tiles read real
    # payload rows whose sentinel indices mask them out of the one-hot, so
    # the 0.5 GB payload copy is skipped (pad.10, 1.6 ms on v5e).
    n_pad = -(-(n + CH) // CH) * CH
    sorted_idx = jnp.concatenate(
        [
            sorted_idx,
            jnp.full((n_pad - n,), n_rows, jnp.int32),
        ]
    )
    if n % CH:
        dg_sorted = jnp.concatenate(
            [dg_sorted, jnp.zeros((n_pad - n, _LANE), dg_sorted.dtype)]
        )

    NW = n_rows // W
    # Upper bound on tiles: every window costs <= ceil(cnt/CH) + 1 tiles
    # (boundary tiles are visited once per adjoining window); overflow
    # slots clamp in-bounds and are zeroed via `valid`.
    n_slots = 2 * NW + n_pad // CH
    wid, off, first, valid = _worklist(
        sorted_idx, n_rows, W, CH, n_slots, dg_sorted.shape[0]
    )

    kernel = functools.partial(_tgrad_kernel, W=W, CH=CH)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_slots,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (W, _LANE), lambda s, wid, off, first, valid: (wid[s], 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((CH // _LANE, _LANE), jnp.int32),
                pltpu.VMEM((CH, _LANE), dg_sorted.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, _LANE), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * CH * W * _LANE,
            bytes_accessed=n_pad * _LANE * dg_sorted.dtype.itemsize
            + n_rows * _LANE * 4,
            transcendentals=0,
        ),
    )(wid, off, first, valid, sorted_idx.reshape(-1, _LANE), dg_sorted)
    return out


def table_grad_ref(sorted_idx: Array, dg_sorted: Array, n_rows: int) -> Array:
    """Pure-jnp oracle (segment-sum semantics, f32 accumulation)."""
    return jax.ops.segment_sum(
        dg_sorted.astype(jnp.float32),
        sorted_idx,
        num_segments=n_rows + 1,
    )[:n_rows]


# custom_vjp needs the table shape in the backward; close over it (cached
# per (n_rows, dtype, level split) so repeated traces reuse one vjp).
@functools.lru_cache(maxsize=None)
def _sized_lookup(
    n_rows: int,
    compute_dtype_name: str,
    interpret: bool,
    level_span: int,
    n_levels: int,
    level_base: int,
):
    cdt = None if compute_dtype_name == "none" else jnp.dtype(
        compute_dtype_name
    )
    span = level_span or n_rows
    W = next(
        (w for w in _window_candidates() if span % w == 0), None
    )

    def plain(table, idx):
        t = table if cdt is None else table.astype(cdt)
        return jnp.take(t, idx, axis=0)

    if W is None:  # tiny/odd tables: keep autodiff's scatter-add
        return plain

    @jax.custom_vjp
    def lookup(table, idx):
        return plain(table, idx)

    def fwd(table, idx):
        return lookup(table, idx), idx

    def bwd(res, dg):
        idx = res
        if not level_span:
            sidx, perm = jax.lax.sort_key_val(
                idx, jnp.arange(idx.shape[0], dtype=jnp.int32)
            )
            dgs = jnp.take(dg, perm, axis=0, unique_indices=True)
            dT = table_grad_sorted(
                sidx, dgs, n_rows=n_rows, W=W, interpret=interpret
            )
            return dT.astype(jnp.float32), None

        # Per-level decomposition: the index array is level-major, so each
        # level's sort/permute touches only its own (m, 128) payload slice
        # and its span of the table — random-row permute reads from a 4x
        # smaller address range (much higher DRAM page locality; the
        # whole-array permute measured 22.5 ms vs a 3.9 ms same-count
        # gather from a 67 MB table on v5e).
        m = idx.shape[0] // n_levels
        parts = []
        for j in range(n_levels):
            base = (level_base + j) * level_span
            idl = idx[j * m : (j + 1) * m] - base
            sidx, perm = jax.lax.sort_key_val(
                idl, jnp.arange(m, dtype=jnp.int32)
            )
            dgs = jnp.take(
                dg[j * m : (j + 1) * m], perm, axis=0, unique_indices=True
            )
            parts.append(
                table_grad_sorted(
                    sidx, dgs, n_rows=level_span, W=W, interpret=interpret
                )
            )
        block = jnp.concatenate(parts, axis=0).astype(jnp.float32)
        lo = level_base * level_span
        hi = lo + n_levels * level_span
        if lo == 0 and hi == n_rows:
            return block, None
        pad_lo = jnp.zeros((lo, _LANE), jnp.float32)
        pad_hi = jnp.zeros((n_rows - hi, _LANE), jnp.float32)
        return jnp.concatenate([pad_lo, block, pad_hi], axis=0), None

    lookup.defvjp(fwd, bwd)
    return lookup


def hash_table_lookup_sized(
    table: Array,
    idx: Array,
    compute_dtype=None,
    interpret: bool = False,
    level_span: int = 0,
    n_levels: int = 1,
    level_base: int = 0,
) -> Array:
    """Public entry: gather with Pallas sorted-reduction backward.

    ``table`` (n_rows, 128) f32; ``idx`` (N,) i32 in [0, n_rows).  The
    gradient wrt ``table`` accumulates in f32 (exact per-row sums) via
    :func:`table_grad_sorted` instead of XLA's serial sorted scatter.

    When ``level_span > 0`` the indices are promised level-major: slice
    ``j`` of ``n_levels`` equal slices holds values in
    ``[(level_base+j)*level_span, (level_base+j+1)*level_span)`` — the
    backward then sorts/permutes per level (better DRAM locality).
    """
    assert table.ndim == 2 and table.shape[1] == _LANE, table.shape
    if level_span and idx.shape[0] % n_levels:
        level_span = 0  # fall back to the global path
    name = "none" if compute_dtype is None else jnp.dtype(compute_dtype).name
    return _sized_lookup(
        int(table.shape[0]), name, interpret, int(level_span),
        int(n_levels), int(level_base),
    )(table, idx)


# ---------------------------------------------------------------------------
# Round-3 factor path: consume (w, dout) residuals directly (VERDICT r2 #2).
#
# The round-2 kernel above ties with XLA's scatter end-to-end because
# permuting the materialized (N, 128) cotangent payload into sorted order
# costs 22.5 ms (unique-access 256 B rows, ~48 GB/s).  But that payload is
# RANK-1 per sample: dg_i = w_i (8,) ⊗ dout_i (F,).  This path therefore
# never materializes dg at all — the custom VJP wraps lookup+combine, sorts
# per level, permutes only a packed (N, 8+F) bf16 factor array (4x fewer
# bytes per row), and rebuilds each 128-sample cotangent tile INSIDE the
# kernel with two 0/1-placement MXU matmuls before the windowed one-hot
# reduction.  Reference capability anchor: tiny-cuda-nn's fused encoder
# backward (examples/radiance_fields/ngp.py:99-137).
# ---------------------------------------------------------------------------


def _factor_kernel(
    wid_ref,  # scalar-prefetch (n_slots,) i32
    off_ref,  # scalar-prefetch (n_slots,) i32
    first_ref,  # scalar-prefetch (n_slots,) i32
    valid_ref,  # scalar-prefetch (n_slots,) i32
    idx_hbm,  # (n_pad/128, 128) i32 in ANY
    pf_hbm,  # (32, n_payload) packed factors [w8 | doutF | pad] rows, ANY
    out_ref,  # (W, 128) f32 block for this slot's window
    idx_vmem,  # scratch (CH/128, 128) i32
    pf_vmem,  # scratch (32, CH) factor dtype
    sems,  # DMA semaphores (2,)
    *,
    W: int,
    CH: int,
    F: int,
    wpack: str = "w8",
):
    # Factors arrive TRANSPOSED — samples on the lane axis — because
    # Mosaic only DMA-slices HBM along lane-tile (128) multiples: a
    # (N, 32) operand's 32-wide minor dim cannot be sliced, but the
    # (32, N) layout slices its lane axis at CH-aligned offsets (this
    # exact shape failed to compile on v5e round 3: "Slice shape along
    # dimension 1 must be aligned to tiling (128), but is 32").
    #
    # Row layouts (wpack):
    #   "w8": [w corner weights 0:8 | dout 8:8+F | pad]
    #   "w3": [wx,wy,wz 0:3 | dout 3:3+F | pad] — the corner weights are
    #         themselves a rank-1 product of the three fractional cell
    #         weights, so only 3 columns ride the sort; the 8 corner rows
    #         are rebuilt here with 16 VPU multiplies per 128-sample tile.
    s = pl.program_id(0)
    off = pl.multiple_of(off_ref[s], CH)
    row0 = pl.multiple_of(off // _LANE, CH // _LANE)

    idx_dma = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(row0, CH // _LANE), :], idx_vmem, sems.at[0]
    )
    pf_dma = pltpu.make_async_copy(
        pf_hbm.at[:, pl.ds(off, CH)], pf_vmem, sems.at[1]
    )
    idx_dma.start()
    pf_dma.start()
    idx_dma.wait()
    pf_dma.wait()

    dt = pf_vmem.dtype
    # 0/1 placement matrices (feature axis on SUBLANES to match the
    # transposed factors): Et spreads w row c -> feature rows
    # [c*F, (c+1)*F); Tt tiles dout row f -> feature rows {c*F + f}.
    # dgT = (Et@wT) * (Tt@dT) rebuilds the rank-1 outer product as a
    # (128 features, 128 samples) tile with two MXU matmuls.
    subE = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 0)
    lanE = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 1)
    Et = (subE // F == lanE).astype(dt)  # (128, 8)
    subT = jax.lax.broadcasted_iota(jnp.int32, (_LANE, F), 0)
    lanT = jax.lax.broadcasted_iota(jnp.int32, (_LANE, F), 1)
    Tt = (subT % F == lanT).astype(dt)  # (128, F)

    pf = pf_vmem[:, :]  # (32, CH); see row layouts above
    d0 = 3 if wpack == "w3" else 8
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, _LANE), 0)
    w0 = wid_ref[s] * W
    w0 = jnp.where(valid_ref[s] == 1, w0, -(W + 1))
    mm = jnp.zeros((W, _LANE), jnp.float32)
    for k in range(CH // _LANE):
        sl = slice(k * _LANE, (k + 1) * _LANE)
        if wpack == "w3":
            wx = pf[0:1, sl].astype(jnp.float32)
            wy = pf[1:2, sl].astype(jnp.float32)
            wz = pf[2:3, sl].astype(jnp.float32)
            W8 = jnp.concatenate(
                [
                    ((wx if dx else 1.0 - wx)
                     * (wy if dy else 1.0 - wy)
                     * (wz if dz else 1.0 - wz))
                    for dx in (0, 1)
                    for dy in (0, 1)
                    for dz in (0, 1)
                ],
                axis=0,
            ).astype(dt)  # (8, 128)
        else:
            W8 = pf[0:8, sl]
        we = jax.lax.dot_general(
            Et, W8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128 feat, 128 samples)
        de = jax.lax.dot_general(
            Tt, pf[d0 : d0 + F, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dgT = (we * de).astype(dt)  # (128, 128) cotangent tile, transposed
        rel = idx_vmem[k, :] - w0  # (128,) lane vector
        oh = (rel[None, :] == rows).astype(dt)  # (W, 128 samples)
        # out[r, f] += sum_j oh[r, j] * dgT[f, j]: contract both lane axes.
        mm = mm + jax.lax.dot_general(
            oh, dgT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[:] = mm

    @pl.when(first_ref[s] == 0)
    def _():
        out_ref[:] = out_ref[:] + mm


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "F", "W", "CH", "interpret", "wpack"),
)
def table_grad_factors_sorted(
    sorted_idx: Array,  # (N,) i32, ascending, values in [0, n_rows]
    packed_sorted_t: Array,  # (32, N); row layout per `wpack`
    *,
    n_rows: int,
    F: int = 16,
    W: int = 512,
    CH: int = 2048,
    interpret: bool = False,
    wpack: str = "w8",
) -> Array:
    """Per-row sums of the rank-1 cotangents ``w_i ⊗ dout_i`` grouped by
    ``sorted_idx`` — (n_rows, 128) f32 — without ever materializing the
    (N, 128) payload.  Layout contract: 8*F == 128 (the fused row width);
    the factors come TRANSPOSED (samples on the lane axis) so the kernel's
    HBM DMA slices land on lane-tile multiples (see :func:`_factor_kernel`).
    """
    assert 8 * F == _LANE
    assert n_rows % W == 0 and CH % _LANE == 0
    assert packed_sorted_t.shape[0] == 32
    n = sorted_idx.shape[0]
    n_pad = -(-(n + CH) // CH) * CH
    sorted_idx = jnp.concatenate(
        [sorted_idx, jnp.full((n_pad - n,), n_rows, jnp.int32)]
    )
    if n % CH:
        packed_sorted_t = jnp.concatenate(
            [
                packed_sorted_t,
                jnp.zeros((32, n_pad - n), packed_sorted_t.dtype),
            ],
            axis=1,
        )

    NW = n_rows // W
    n_slots = 2 * NW + n_pad // CH
    wid, off, first, valid = _worklist(
        sorted_idx, n_rows, W, CH, n_slots, packed_sorted_t.shape[1]
    )

    kernel = functools.partial(_factor_kernel, W=W, CH=CH, F=F, wpack=wpack)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_slots,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (W, _LANE), lambda s, wid, off, first, valid: (wid[s], 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((CH // _LANE, _LANE), jnp.int32),
                pltpu.VMEM((32, CH), packed_sorted_t.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, _LANE), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * CH * (W + 24) * _LANE,
            bytes_accessed=n_pad * 32 * packed_sorted_t.dtype.itemsize
            + n_rows * _LANE * 4,
            transcendentals=0,
        ),
    )(wid, off, first, valid, sorted_idx.reshape(-1, _LANE), packed_sorted_t)
    return out


def _factor_kernel_u10(
    wid_ref,
    off_ref,
    first_ref,
    valid_ref,
    idx_hbm,  # (n_pad/128, 128) i32 in ANY
    wq_hbm,  # (n_pad/128, 128) i32 in ANY — [qx<<20 | qy<<10 | qz] u10x3
    dout_hbm,  # (F, n_payload) dout rows, transposed, ANY
    out_ref,  # (W, 128) f32 block
    idx_vmem,  # scratch (CH/128, 128) i32
    wq_vmem,  # scratch (CH/128, 128) i32
    dout_vmem,  # scratch (F, CH)
    sems,  # DMA semaphores (3,)
    *,
    W: int,
    CH: int,
    F: int,
):
    """wpack="u10" variant of :func:`_factor_kernel`: the three fractional
    cell weights arrive QUANTIZED to 10-bit fixed point inside one int32
    per sample (absolute error <= 2^-11 on [0,1] weights — below the bf16
    payload's own rounding at these magnitudes), so the sort moves one
    i32 weight operand instead of two, and this kernel dequantizes on the
    VPU before the same two-matmul tile rebuild."""
    s = pl.program_id(0)
    off = pl.multiple_of(off_ref[s], CH)
    row0 = pl.multiple_of(off // _LANE, CH // _LANE)

    idx_dma = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(row0, CH // _LANE), :], idx_vmem, sems.at[0]
    )
    wq_dma = pltpu.make_async_copy(
        wq_hbm.at[pl.ds(row0, CH // _LANE), :], wq_vmem, sems.at[1]
    )
    d_dma = pltpu.make_async_copy(
        dout_hbm.at[:, pl.ds(off, CH)], dout_vmem, sems.at[2]
    )
    idx_dma.start()
    wq_dma.start()
    d_dma.start()
    idx_dma.wait()
    wq_dma.wait()
    d_dma.wait()

    dt = dout_vmem.dtype
    subE = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 0)
    lanE = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8), 1)
    Et = (subE // F == lanE).astype(dt)  # (128, 8)
    subT = jax.lax.broadcasted_iota(jnp.int32, (_LANE, F), 0)
    lanT = jax.lax.broadcasted_iota(jnp.int32, (_LANE, F), 1)
    Tt = (subT % F == lanT).astype(dt)  # (128, F)

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, _LANE), 0)
    w0 = wid_ref[s] * W
    w0 = jnp.where(valid_ref[s] == 1, w0, -(W + 1))
    inv = jnp.float32(1.0 / 1023.0)
    mm = jnp.zeros((W, _LANE), jnp.float32)
    for k in range(CH // _LANE):
        sl = slice(k * _LANE, (k + 1) * _LANE)
        wq = wq_vmem[k, :]  # (128,) i32 lanes
        wx = ((wq >> 20) & 1023).astype(jnp.float32)[None, :] * inv
        wy = ((wq >> 10) & 1023).astype(jnp.float32)[None, :] * inv
        wz = (wq & 1023).astype(jnp.float32)[None, :] * inv
        W8 = jnp.concatenate(
            [
                ((wx if dx else 1.0 - wx)
                 * (wy if dy else 1.0 - wy)
                 * (wz if dz else 1.0 - wz))
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            ],
            axis=0,
        ).astype(dt)  # (8, 128)
        we = jax.lax.dot_general(
            Et, W8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        de = jax.lax.dot_general(
            Tt, dout_vmem[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dgT = (we * de).astype(dt)  # (128, 128) cotangent tile, transposed
        rel = idx_vmem[k, :] - w0
        oh = (rel[None, :] == rows).astype(dt)
        mm = mm + jax.lax.dot_general(
            oh, dgT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[:] = mm

    @pl.when(first_ref[s] == 0)
    def _():
        out_ref[:] = out_ref[:] + mm


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "F", "W", "CH", "interpret"),
)
def table_grad_factors_sorted_u10(
    sorted_idx: Array,  # (N,) i32, ascending, values in [0, n_rows]
    wq_sorted: Array,  # (N,) i32, u10x3-packed fractional weights
    dout_sorted_t: Array,  # (F, N) dout rows, transposed
    *,
    n_rows: int,
    F: int = 16,
    W: int = 512,
    CH: int = 2048,
    interpret: bool = False,
) -> Array:
    """u10-packed flavor of :func:`table_grad_factors_sorted` (one int32
    weight operand through the sort instead of two bf16-pair columns)."""
    assert 8 * F == _LANE
    assert n_rows % W == 0 and CH % _LANE == 0
    assert dout_sorted_t.shape[0] == F
    n = sorted_idx.shape[0]
    n_pad = -(-(n + CH) // CH) * CH
    sorted_idx = jnp.concatenate(
        [sorted_idx, jnp.full((n_pad - n,), n_rows, jnp.int32)]
    )
    wq_sorted = jnp.concatenate(
        [wq_sorted, jnp.zeros((n_pad - n,), jnp.int32)]
    )
    if n % CH:
        dout_sorted_t = jnp.concatenate(
            [
                dout_sorted_t,
                jnp.zeros((F, n_pad - n), dout_sorted_t.dtype),
            ],
            axis=1,
        )

    NW = n_rows // W
    n_slots = 2 * NW + n_pad // CH
    wid, off, first, valid = _worklist(
        sorted_idx, n_rows, W, CH, n_slots, dout_sorted_t.shape[1]
    )

    kernel = functools.partial(_factor_kernel_u10, W=W, CH=CH, F=F)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_slots,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (W, _LANE), lambda s, wid, off, first, valid: (wid[s], 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((CH // _LANE, _LANE), jnp.int32),
                pltpu.VMEM((CH // _LANE, _LANE), jnp.int32),
                pltpu.VMEM((F, CH), dout_sorted_t.dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, _LANE), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * CH * (W + 24) * _LANE,
            bytes_accessed=n_pad
            * (8 + F * dout_sorted_t.dtype.itemsize)
            + n_rows * _LANE * 4,
            transcendentals=0,
        ),
    )(
        wid, off, first, valid,
        sorted_idx.reshape(-1, _LANE),
        wq_sorted.reshape(-1, _LANE),
        dout_sorted_t,
    )
    return out


def _slice_combine(g, wlist, F):
    """Row-major corner combine: ``out[k, f] = sum_c w_c[k] * g[k, c*F+f]``.

    One loop fusion of 8 lane slices over the gather output in its NATIVE
    row-major layout.  The einsum form of the same contraction makes XLA
    relayout the (N, 8F) gather output to column-major first (trace:
    copy.216 = 1.58 ms/train-step, copy.9 = 3.15 ms/occ-update at the
    flagship shape) because the batched 8xF dot wants samples on lanes;
    slicing + broadcast-multiply keeps the whole combine in the gather's
    layout and the relayout disappears.  Unlike the round-4 ``mxu``
    attempt this never materializes an (N, 128) weight tensor — each
    corner weight stays a (N, 1) broadcast inside the fusion.
    Accumulates in f32, returns the gather dtype.
    """
    acc = None
    for c, wc in enumerate(wlist):
        term = wc[:, None].astype(jnp.float32) * jax.lax.slice_in_dim(
            g, c * F, (c + 1) * F, axis=1
        ).astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc.astype(g.dtype)


@functools.lru_cache(maxsize=None)
def _sized_lookup_combine(
    n_rows: int,
    F: int,
    compute_dtype_name: str,
    interpret: bool,
    level_span: int,
    n_levels: int,
    level_base: int,
):
    """custom_vjp for ``out[k, f] = sum_c w[k, c] * table_c[idx_k, c*F+f]``
    whose table gradient runs :func:`table_grad_factors_sorted`.

    The ``w`` cotangent is ZERO by contract: in every training path here the
    sample positions come from rays and a stop-gradient traversal, so no
    parameter lies upstream of ``w`` — skipping ``dw`` avoids a second table
    gather.  Do NOT reuse this op where positions require gradients
    (e.g. BARF pose refinement uses the parity encoders, not this path).
    """
    cdt = None if compute_dtype_name == "none" else jnp.dtype(
        compute_dtype_name
    )
    span = level_span or n_rows
    W = next(
        (w for w in _window_candidates() if span % w == 0), None
    )
    fdt = jnp.bfloat16 if cdt is not None else jnp.float32

    def plain(table, idx, w):
        t = (table if cdt is None else table.astype(cdt))
        g = jnp.take(t, idx, axis=0)
        if os.environ.get("NERFACC_COMBINE", "einsum") == "slice":
            return _slice_combine(g, [w[:, c] for c in range(8)], F)
        wc = w if cdt is None else w.astype(cdt)
        return jnp.einsum(
            "kc,kcf->kf", wc, g.reshape(g.shape[0], 8, F)
        )

    if W is None:
        return plain

    @jax.custom_vjp
    def lookup_combine(table, idx, w):
        return plain(table, idx, w)

    def fwd(table, idx, w):
        return lookup_combine(table, idx, w), (idx, w)

    def bwd(res, dout):
        idx, w = res
        nlv = n_levels if level_span else 1
        spn = level_span or n_rows
        m = idx.shape[0] // nlv
        packed = jnp.concatenate(
            [
                w.astype(fdt),
                dout.astype(fdt),
                jnp.zeros((idx.shape[0], 24 - F), fdt),
            ],
            axis=1,
        )  # (N, 32) [w8 | doutF | pad]
        # Data movement into sorted order, A/B-able (NERFACC_FACTOR_MOVE):
        #   "take"  — sort (idx, iota) then random-gather the factor rows
        #             (one ~10 ns HBM transaction per row, zero reuse);
        #   "carry" — carry the factor columns THROUGH lax.sort as extra
        #             operands: the bitonic/merge network is sequential-
        #             access, trading the random-gather transaction floor
        #             for wider sort stages.
        # Either way the kernel consumes the factors TRANSPOSED — (32, m)
        # with samples on lanes (Mosaic HBM-slice alignment; carry's f32
        # flavor gets that layout for free from stacking sorted columns).
        # carry won the round-3 device A/B decisively: 9.54M vs 8.12M
        # samples/s end-to-end on v5e (take's random 64 B-row gather pays
        # the per-transaction floor; the sort's merge stages stream).
        carry = os.environ.get("NERFACC_FACTOR_MOVE", "carry") == "carry"
        parts = []
        for j in range(nlv):
            base = (level_base + j) * spn if level_span else 0
            idl = idx[j * m : (j + 1) * m] - base
            pck = packed[j * m : (j + 1) * m]
            if carry:
                if fdt == jnp.bfloat16:
                    cols = jax.lax.bitcast_convert_type(
                        pck.reshape(m, 16, 2), jnp.int32
                    )  # (m, 16) i32, two bf16s per lane
                else:
                    cols = jax.lax.bitcast_convert_type(pck, jnp.int32)
                nc = cols.shape[1]
                sorted_ops = jax.lax.sort(
                    (idl,) + tuple(cols[:, c] for c in range(nc)),
                    num_keys=1,
                    is_stable=False,
                )
                sidx = sorted_ops[0]
                sc = jnp.stack(sorted_ops[1:], axis=0)  # (nc, m) i32
                if fdt == jnp.bfloat16:
                    # (16, m) i32 pair columns -> (32, m) bf16 rows.
                    pfs = _unpack_bf16_pairs_t(sc, 32)
                else:
                    pfs = jax.lax.bitcast_convert_type(sc, jnp.float32)
            else:
                sidx, perm = jax.lax.sort_key_val(
                    idl, jnp.arange(m, dtype=jnp.int32)
                )
                pfs = jnp.take(
                    pck, perm, axis=0, unique_indices=True,
                ).T  # row-gather the 64 B rows, then one streaming transpose
            parts.append(
                table_grad_factors_sorted(
                    sidx, pfs, n_rows=spn, F=F, W=W, interpret=interpret
                )
            )
        block = (
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        )
        lo = level_base * spn if level_span else 0
        hi = lo + nlv * spn
        if lo == 0 and hi == n_rows:
            dtable = block
        else:
            dtable = jnp.concatenate(
                [
                    jnp.zeros((lo, _LANE), jnp.float32),
                    block,
                    jnp.zeros((n_rows - hi, _LANE), jnp.float32),
                ],
                axis=0,
            )
        return dtable, None, jnp.zeros_like(w)

    lookup_combine.defvjp(fwd, bwd)
    return lookup_combine


def hash_lookup_combine(
    table: Array,  # (n_rows, 8*F) f32 master table
    idx: Array,  # (N,) i32
    w: Array,  # (N, 8) trilinear corner weights
    compute_dtype=None,
    interpret: bool = False,
    level_span: int = 0,
    n_levels: int = 1,
    level_base: int = 0,
) -> Array:
    """Fused gather + trilinear combine whose backward consumes the
    (w, dout) factors directly (never materializing or permuting the wide
    cotangent payload).  Returns ``(N, F)``.  See
    :func:`_sized_lookup_combine` for the zero-``dw`` contract.
    """
    assert table.ndim == 2 and table.shape[1] % 8 == 0
    F = table.shape[1] // 8
    assert 8 * F == _LANE, "factor path needs 128-wide rows"
    if level_span and idx.shape[0] % n_levels:
        level_span = 0
    name = "none" if compute_dtype is None else jnp.dtype(compute_dtype).name
    return _sized_lookup_combine(
        int(table.shape[0]), int(F), name, interpret, int(level_span),
        int(n_levels), int(level_base),
    )(table, idx, w)


@functools.lru_cache(maxsize=None)
def _sized_lookup_combine3(
    n_rows: int,
    F: int,
    compute_dtype_name: str,
    interpret: bool,
    level_span: int,
    n_levels: int,
    level_base: int,
):
    """w3-packed variant of :func:`_sized_lookup_combine`: the residual is
    the three fractional cell weights (wx, wy, wz) instead of the 8 corner
    weights — the corners are their rank-1 product, so only 3 columns ride
    the backward's sort (11 int32 sort operands vs 17) and the kernel
    rebuilds the corner rows in VMEM.  Same zero-positions-gradient
    contract as the w8 path."""
    cdt = None if compute_dtype_name == "none" else jnp.dtype(
        compute_dtype_name
    )
    span = level_span or n_rows
    W = next(
        (w for w in _window_candidates() if span % w == 0), None
    )
    fdt = jnp.bfloat16 if cdt is not None else jnp.float32
    NC = 20  # [wx wy wz | dout F | pad] — even, so bf16 pairs to 10 i32

    def corner_weights(wx, wy, wz):
        return jnp.stack(
            [
                (wx if dx else 1.0 - wx)
                * (wy if dy else 1.0 - wy)
                * (wz if dz else 1.0 - wz)
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            ],
            axis=-1,
        )

    def plain(table, idx, wx, wy, wz):
        t = table if cdt is None else table.astype(cdt)
        g = jnp.take(t, idx, axis=0)
        if os.environ.get("NERFACC_COMBINE", "einsum") == "slice":
            wlist = [
                (wx if dx else 1.0 - wx)
                * (wy if dy else 1.0 - wy)
                * (wz if dz else 1.0 - wz)
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            ]
            return _slice_combine(g, wlist, F)
        if os.environ.get("NERFACC_COMBINE", "einsum") == "mxu":
            # Lane-native combine (MEASURED NEGATIVE, round-4 device A/B:
            # step 48.1 vs 44.7 ms; occ update regressed too).  The idea:
            # the einsum form makes XLA relayout the (N, 128) gather
            # output to column-major (copy.216 = 1.59 ms train / copy.9 =
            # 3.15 ms occ-update), so build corner weights at 128 lanes
            # from (k,1) broadcasts and fold the corner sum into one
            # constant 0/1 MXU matmul consuming g row-major.  On device
            # the explicit (N, 128) weight tensor is real extra traffic
            # that exceeds the relayout it saves — the same physics that
            # killed round 3's lane-aligned combine on the autodiff path.
            # Kept opt-in for the record.
            lane = jnp.arange(_LANE, dtype=jnp.int32)
            c = lane // F
            dt = g.dtype
            bx, by, bz = (c >> 2) & 1, (c >> 1) & 1, c & 1
            wB = (
                jnp.where(bx[None, :] == 1, wx[:, None], 1.0 - wx[:, None])
                * jnp.where(by[None, :] == 1, wy[:, None], 1.0 - wy[:, None])
                * jnp.where(bz[None, :] == 1, wz[:, None], 1.0 - wz[:, None])
            ).astype(dt)
            S = (lane[:, None] % F == jnp.arange(F)[None, :]).astype(dt)
            out = jax.lax.dot_general(
                wB * g, S,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.astype(dt)
        w = corner_weights(wx, wy, wz)
        wc = w if cdt is None else w.astype(cdt)
        return jnp.einsum(
            "kc,kcf->kf", wc, g.reshape(g.shape[0], 8, F)
        )

    if W is None:
        return plain

    @jax.custom_vjp
    def lookup_combine(table, idx, wx, wy, wz):
        return plain(table, idx, wx, wy, wz)

    def fwd(table, idx, wx, wy, wz):
        return lookup_combine(table, idx, wx, wy, wz), (idx, wx, wy, wz)

    def bwd(res, dout):
        idx, wx, wy, wz = res
        nlv = n_levels if level_span else 1
        spn = level_span or n_rows
        m = idx.shape[0] // nlv

        def _assemble(parts):
            block = (
                parts[0]
                if len(parts) == 1
                else jnp.concatenate(parts, axis=0)
            )
            lo = level_base * spn if level_span else 0
            hi = lo + nlv * spn
            if lo == 0 and hi == n_rows:
                dtable = block
            else:
                dtable = jnp.concatenate(
                    [
                        jnp.zeros((lo, _LANE), jnp.float32),
                        block,
                        jnp.zeros((n_rows - hi, _LANE), jnp.float32),
                    ],
                    axis=0,
                )
            return (
                dtable,
                None,
                jnp.zeros_like(wx),
                jnp.zeros_like(wy),
                jnp.zeros_like(wz),
            )

        fpack = os.environ.get("NERFACC_FACTOR_PACK", "u10")
        if fpack in ("u10", "u10f8") and fdt == jnp.bfloat16:
            # (f32 compute keeps the w3 path below — u10's bf16 dout
            # columns would silently halve the full-precision payload.)
            # u10 movement: quantize (wx,wy,wz) to 10-bit fixed point in
            # ONE int32 (error <= 2^-11, below the bf16 payload's own
            # rounding) — the per-level sort then moves 10 operands
            # (key + wq + F/2 dout pairs) instead of w3's 11, and the
            # weight column skips the bf16 unpack transpose entirely.
            # Clamp before packing: a weight nudged outside [0, 1] by float
            # error upstream would otherwise bleed sign/overflow bits into
            # the adjacent 10-bit fields, corrupting all three dequantized
            # weights for that sample (cheap VPU ops, no measurable cost).
            def q10(w):
                return jnp.clip(
                    jnp.round(w * 1023.0), 0.0, 1023.0
                ).astype(jnp.int32)

            wq = (q10(wx) << 20) | (q10(wy) << 10) | q10(wz)
            if fpack == "u10f8":
                # f8 dout carry: quantize the cotangent rows to
                # float8_e5m2 for the SORT ONLY (4 features per i32
                # column — key + wq + F/4 payload operands instead of
                # u10's F/2; at F=16 that is 6 sort operands vs 10).
                # e5m2 keeps bf16's exponent range (no scale factor
                # needed); the cost is 2 mantissa bits on a gradient
                # that Adam renormalizes and training noise dominates —
                # the 33 dB bench gate is the acceptance test.
                assert F % 4 == 0
                dcols = jax.lax.bitcast_convert_type(
                    dout.astype(jnp.float8_e5m2).reshape(
                        idx.shape[0], F // 4, 4
                    ),
                    jnp.int32,
                )  # (N, F/4)
                _unpack_dout = _unpack_f8_quads_t
            else:
                dcols = jax.lax.bitcast_convert_type(
                    dout.astype(jnp.bfloat16).reshape(
                        idx.shape[0], F // 2, 2
                    ),
                    jnp.int32,
                )  # (N, F/2)
                _unpack_dout = _unpack_bf16_pairs_t
            n_dcols = dcols.shape[1]
            # NERFACC_FACTOR_BATCH=1: ONE sort + ONE kernel across all
            # levels instead of nlv separate ones.  The keys are already
            # globally unique (each level's ids live in its own
            # [j*spn, (j+1)*spn) span), so batching only re-bases them to
            # the block start.  Sort cost on v5e is ~0.85 ms base +
            # ~0.19 ms/operand per 512k elements — one 4x-longer sort
            # saves 3 sort bases plus 3 kernel/worklist fixed costs
            # (round-4 trace: 4 x 2.06 ms sorts + 4 x 1.24-1.50 ms
            # kernels were the top step cost).
            if os.environ.get("NERFACC_FACTOR_BATCH", "0") == "1" and nlv > 1:
                base0 = level_base * spn if level_span else 0
                sorted_ops = jax.lax.sort(
                    (idx - base0, wq)
                    + tuple(dcols[:, c] for c in range(n_dcols)),
                    num_keys=1,
                    is_stable=False,
                )
                dt_s = jnp.stack(sorted_ops[2:], axis=0)  # (n_dcols, N) i32
                dout_t = _unpack_dout(dt_s, F)
                return _assemble([
                    table_grad_factors_sorted_u10(
                        sorted_ops[0], sorted_ops[1], dout_t,
                        n_rows=nlv * spn, F=F, W=W, interpret=interpret,
                    )
                ])
            parts = []
            for j in range(nlv):
                base = (level_base + j) * spn if level_span else 0
                sl = slice(j * m, (j + 1) * m)
                sorted_ops = jax.lax.sort(
                    (idx[sl] - base, wq[sl])
                    + tuple(dcols[sl, c] for c in range(n_dcols)),
                    num_keys=1,
                    is_stable=False,
                )
                # MEASURED NEGATIVE (round-4 device A/B, 40.9 vs 38.86
                # ms step): consuming the raw i32 pair columns and
                # de-interleaving in-kernel (x<<16 / x&0xffff0000 bitcast,
                # even/odd placement matmuls) cost MORE than this host
                # unpack despite its 2-minor-layout padding — the kernel's
                # per-tile critical path grew by more than the 2.6 ms of
                # copies it saved.  Keep the host unpack.
                dt_s = jnp.stack(sorted_ops[2:], axis=0)  # (n_dcols, m) i32
                dout_t = _unpack_dout(dt_s, F)
                parts.append(
                    table_grad_factors_sorted_u10(
                        sorted_ops[0], sorted_ops[1], dout_t,
                        n_rows=spn, F=F, W=W, interpret=interpret,
                    )
                )
            return _assemble(parts)
        packed = jnp.concatenate(
            [
                wx[:, None].astype(fdt),
                wy[:, None].astype(fdt),
                wz[:, None].astype(fdt),
                dout.astype(fdt),
                jnp.zeros((idx.shape[0], NC - 3 - F), fdt),
            ],
            axis=1,
        )  # (N, NC)
        carry = os.environ.get("NERFACC_FACTOR_MOVE", "carry") == "carry"
        parts = []
        for j in range(nlv):
            base = (level_base + j) * spn if level_span else 0
            idl = idx[j * m : (j + 1) * m] - base
            pck = packed[j * m : (j + 1) * m]
            if carry:
                if fdt == jnp.bfloat16:
                    cols = jax.lax.bitcast_convert_type(
                        pck.reshape(m, NC // 2, 2), jnp.int32
                    )
                else:
                    cols = jax.lax.bitcast_convert_type(pck, jnp.int32)
                nc = cols.shape[1]
                sorted_ops = jax.lax.sort(
                    (idl,) + tuple(cols[:, c] for c in range(nc)),
                    num_keys=1,
                    is_stable=False,
                )
                sidx = sorted_ops[0]
                sc = jnp.stack(sorted_ops[1:], axis=0)  # (nc, m) i32
                if fdt == jnp.bfloat16:
                    pfs = _unpack_bf16_pairs_t(sc, NC)
                else:
                    pfs = jax.lax.bitcast_convert_type(sc, jnp.float32)
            else:
                sidx, perm = jax.lax.sort_key_val(
                    idl, jnp.arange(m, dtype=jnp.int32)
                )
                pfs = jnp.take(
                    pck, perm, axis=0, unique_indices=True
                ).T
            # Kernel contract is 32 rows; the tail rows are never read for
            # wpack="w3" but keep the HBM operand tile-aligned.
            pfs = jnp.concatenate(
                [pfs, jnp.zeros((32 - NC, m), fdt)], axis=0
            )
            parts.append(
                table_grad_factors_sorted(
                    sidx, pfs, n_rows=spn, F=F, W=W,
                    interpret=interpret, wpack="w3",
                )
            )
        return _assemble(parts)

    lookup_combine.defvjp(fwd, bwd)
    return lookup_combine


def hash_lookup_combine3(
    table: Array,  # (n_rows, 8*F) f32 master table
    idx: Array,  # (N,) i32
    wx: Array,  # (N,) fractional cell weights, one per axis
    wy: Array,
    wz: Array,
    compute_dtype=None,
    interpret: bool = False,
    level_span: int = 0,
    n_levels: int = 1,
    level_base: int = 0,
) -> Array:
    """Fused gather + trilinear combine taking the three fractional cell
    weights directly; the backward carries only (wx, wy, wz, dout) through
    the sort and rebuilds corner weights in-kernel (wpack="w3").  Returns
    ``(N, F)``.  Zero gradient to positions/weights by contract."""
    assert table.ndim == 2 and table.shape[1] % 8 == 0
    F = table.shape[1] // 8
    assert 8 * F == _LANE, "factor path needs 128-wide rows"
    if level_span and idx.shape[0] % n_levels:
        level_span = 0
    name = "none" if compute_dtype is None else jnp.dtype(compute_dtype).name
    return _sized_lookup_combine3(
        int(table.shape[0]), int(F), name, interpret, int(level_span),
        int(n_levels), int(level_base),
    )(table, idx, wx, wy, wz)


def _factor_kernel_pos(
    wid_ref,
    off_ref,
    first_ref,
    valid_ref,
    idx_hbm,  # (n_pad/128, 128) i32 in ANY
    pos_hbm,  # (4, n_payload) f32 positions (row 3 = pad), transposed, ANY
    dout_hbm,  # (DPAD, n_payload) dout rows (DPAD >= Jg*F, bf16-tile pad), ANY
    out_ref,  # (W, 128) f32 block
    idx_vmem,  # scratch (CH/128, 128) i32
    pos_vmem,  # scratch (4, CH) f32
    dout_vmem,  # scratch (DPAD, CH)
    sems,  # DMA semaphores (3,)
    *,
    W: int,
    CH: int,
    F: int,
    J: int,  # sub-levels per 128-lane row (the LAYOUT, 128 // (8*F))
    J_LO: int,  # first ACTIVE sub-level of this fetch
    JG: int,  # number of active sub-levels
    KEY_K: int,  # window-relative index of the fetch's KEY sub-level
    RES: tuple,  # JG active-sub-level resolutions (compile-time floats)
    DPAD: int,  # dout rows incl. bf16 sublane-tile padding
):
    """Grouped-row factor kernel for the tcnn-shape encoder
    (``models/hash_soa.py:HashGridEncoderGrouped``): one 128-lane table
    row holds ``J`` sub-levels x 8 corners x ``F`` features (lane ``l`` =
    corner ``l // (J*F)``, sub-level ``(l % (J*F)) // F``, feature
    ``l % F``), and a FETCH covers the active sub-level window
    ``[J_LO, J_LO+JG)`` — split-key rows let two fetches with different
    key grids share one row (disjoint lane sets), which is what gives the
    encoder a fused-class multiresolution ladder at tcnn's parameter
    count.  The backward carries the raw f32 sample POSITIONS through the
    sort (3 operands) instead of packed per-sub-level weight words — all
    fracs are recomputed here on the VPU from the compile-time
    resolutions, bit-identical to the forward's ``x*r - floor(x*r)``.
    Inactive lanes get ZERO cotangent via the placement matmuls.  The
    cotangent tile keeps the blocked rank-1 structure
    ``(W placed) * (dout placed)``."""
    s = pl.program_id(0)
    off = pl.multiple_of(off_ref[s], CH)
    row0 = pl.multiple_of(off // _LANE, CH // _LANE)

    idx_dma = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(row0, CH // _LANE), :], idx_vmem, sems.at[0]
    )
    pos_dma = pltpu.make_async_copy(
        pos_hbm.at[:, pl.ds(off, CH)], pos_vmem, sems.at[1]
    )
    d_dma = pltpu.make_async_copy(
        dout_hbm.at[:, pl.ds(off, CH)], dout_vmem, sems.at[2]
    )
    idx_dma.start()
    pos_dma.start()
    d_dma.start()
    idx_dma.wait()
    pos_dma.wait()
    d_dma.wait()

    dt = dout_vmem.dtype
    JF = J * F
    # Placement matmuls over the ACTIVE window.  W rows are ordered
    # [j - J_LO][c]; lane l maps to corner c = l // JF and layout
    # sub-level j = (l % JF) // F.  Out-of-window lanes match no row of
    # either placement, so their cotangent is exactly zero.
    lE = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8 * JG), 0)
    mE = jax.lax.broadcasted_iota(jnp.int32, (_LANE, 8 * JG), 1)
    jjE = (lE % JF) // F
    Et = (
        ((jjE - J_LO) * 8 + lE // JF == mE)
        & (jjE >= J_LO) & (jjE < J_LO + JG)
    ).astype(dt)  # (128, 8*JG)
    lT = jax.lax.broadcasted_iota(jnp.int32, (_LANE, DPAD), 0)
    tT = jax.lax.broadcasted_iota(jnp.int32, (_LANE, DPAD), 1)
    jjT = (lT % JF) // F
    Tt = (
        ((jjT - J_LO) * F + lT % F == tT)
        & (jjT >= J_LO) & (jjT < J_LO + JG)
    ).astype(dt)  # (128, DPAD); columns >= JG*F never match

    rows = jax.lax.broadcasted_iota(jnp.int32, (W, _LANE), 0)
    w0 = wid_ref[s] * W
    w0 = jnp.where(valid_ref[s] == 1, w0, -(W + 1))
    mm = jnp.zeros((W, _LANE), jnp.float32)
    for k in range(CH // _LANE):
        sl = slice(k * _LANE, (k + 1) * _LANE)
        x = pos_vmem[0, sl][None, :]  # (1, 128) f32
        y = pos_vmem[1, sl][None, :]
        z = pos_vmem[2, sl][None, :]
        w_rows = []
        for j in range(JG):
            r = jnp.float32(RES[j])
            xl = x * r
            yl = y * r
            zl = z * r
            if j == KEY_K:
                # The key sub-level's trilerp is cell-consistent
                # (corner-fused semantics): true fracs.
                wx = xl - jnp.floor(xl)
                wy = yl - jnp.floor(yl)
                wz = zl - jnp.floor(zl)
            else:
                # Non-key sub-levels: CONTINUOUS triangle-wave weights
                # (a sawtooth frac would jump at their lattice planes
                # while the features stay keyed elsewhere — measured
                # +5.4 dB on the CPU convergence repro).
                hx, hy, hz = xl * 0.5, yl * 0.5, zl * 0.5
                wx = 1.0 - jnp.abs(2.0 * (hx - jnp.floor(hx)) - 1.0)
                wy = 1.0 - jnp.abs(2.0 * (hy - jnp.floor(hy)) - 1.0)
                wz = 1.0 - jnp.abs(2.0 * (hz - jnp.floor(hz)) - 1.0)
            w_rows.append(
                jnp.concatenate(
                    [
                        ((wx if dx else 1.0 - wx)
                         * (wy if dy else 1.0 - wy)
                         * (wz if dz else 1.0 - wz))
                        for dx in (0, 1)
                        for dy in (0, 1)
                        for dz in (0, 1)
                    ],
                    axis=0,
                )
            )
        WJG = jnp.concatenate(w_rows, axis=0).astype(dt)  # (8*JG, 128)
        we = jax.lax.dot_general(
            Et, WJG,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        de = jax.lax.dot_general(
            Tt, dout_vmem[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dgT = (we * de).astype(dt)  # (128, 128) cotangent tile, transposed
        rel = idx_vmem[k, :] - w0
        oh = (rel[None, :] == rows).astype(dt)
        mm = mm + jax.lax.dot_general(
            oh, dgT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[:] = mm

    @pl.when(first_ref[s] == 0)
    def _():
        out_ref[:] = out_ref[:] + mm


def _bf16_pad_rows(n: int) -> int:
    """Sublane-tile-aligned row count for a bf16 (rows, n) HBM operand
    (Mosaic: slices must be multiples of the (16, 128) bf16 tile)."""
    return -(-n // 16) * 16


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_rows", "RES", "F", "J", "J_LO", "JG", "KEY_K", "W", "CH",
        "interpret",
    ),
)
def table_grad_factors_sorted_pos(
    sorted_idx: Array,  # (N,) i32, ascending, values in [0, n_rows]
    pos_sorted_t: Array,  # (3, N) f32 sample positions, transposed
    dout_sorted_t: Array,  # (JG*F, N) dout rows, transposed
    *,
    n_rows: int,
    RES: tuple,
    F: int = 2,
    J: int = 8,
    J_LO: int = 0,
    JG: int = 8,
    KEY_K: int = -1,
    W: int = 512,
    CH: int = 2048,
    interpret: bool = False,
) -> Array:
    """Positional grouped flavor of :func:`table_grad_factors_sorted_u10`
    (3 raw f32 position operands through the sort instead of per-sub-level
    weight words; fracs recomputed in-kernel from compile-time ``RES``).
    ``J_LO``/``JG`` select the active sub-level window of the 128-lane
    row layout (split-key fetches)."""
    assert 8 * F * J == _LANE
    assert len(RES) == JG and J_LO + JG <= J
    assert n_rows % W == 0 and CH % _LANE == 0
    assert pos_sorted_t.shape[0] == 3
    assert dout_sorted_t.shape[0] == JG * F
    n = sorted_idx.shape[0]
    n_pad = -(-(n + CH) // CH) * CH
    sorted_idx = jnp.concatenate(
        [sorted_idx, jnp.full((n_pad - n,), n_rows, jnp.int32)]
    )
    # Mosaic HBM->VMEM slices must be tile-aligned on the SUBLANE dim too
    # (f32 tiling (4, 128), bf16 (16, 128): "Slice shape along dimension 0
    # must be aligned to tiling" on device) — pad the position operand to
    # 4 rows and the dout operand to a 16-row multiple; the kernel's
    # placement matmul has zero columns for the pad rows.
    DPAD = _bf16_pad_rows(JG * F) if dout_sorted_t.dtype == jnp.bfloat16 \
        else -(-(JG * F) // 4) * 4
    pos_sorted_t = jnp.concatenate(
        [
            pos_sorted_t,
            jnp.zeros((1, pos_sorted_t.shape[1]), pos_sorted_t.dtype),
        ],
        axis=0,
    )
    if DPAD != JG * F:
        dout_sorted_t = jnp.concatenate(
            [
                dout_sorted_t,
                jnp.zeros(
                    (DPAD - JG * F, dout_sorted_t.shape[1]),
                    dout_sorted_t.dtype,
                ),
            ],
            axis=0,
        )
    if n % CH:
        pos_sorted_t = jnp.concatenate(
            [pos_sorted_t, jnp.zeros((4, n_pad - n), pos_sorted_t.dtype)],
            axis=1,
        )
        dout_sorted_t = jnp.concatenate(
            [
                dout_sorted_t,
                jnp.zeros((DPAD, n_pad - n), dout_sorted_t.dtype),
            ],
            axis=1,
        )

    NW = n_rows // W
    n_slots = 2 * NW + n_pad // CH
    wid, off, first, valid = _worklist(
        sorted_idx, n_rows, W, CH, n_slots, dout_sorted_t.shape[1]
    )

    kernel = functools.partial(
        _factor_kernel_pos, W=W, CH=CH, F=F, J=J, J_LO=J_LO, JG=JG,
        KEY_K=KEY_K, RES=RES, DPAD=DPAD,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_slots,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (W, _LANE), lambda s, wid, off, first, valid: (wid[s], 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((CH // _LANE, _LANE), jnp.int32),
                pltpu.VMEM((4, CH), jnp.float32),
                pltpu.VMEM((DPAD, CH), dout_sorted_t.dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, _LANE), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * CH * (W + 8 * JG + DPAD) * _LANE,
            bytes_accessed=n_pad
            * (16 + DPAD * dout_sorted_t.dtype.itemsize)
            + n_rows * _LANE * 4,
            transcendentals=0,
        ),
    )(
        wid, off, first, valid,
        sorted_idx.reshape(-1, _LANE),
        pos_sorted_t,
        dout_sorted_t,
    )
    return out


@functools.lru_cache(maxsize=None)
def _sized_lookup_combine_pos(
    n_rows: int,
    F: int,
    J: int,
    compute_dtype_name: str,
    interpret: bool,
    level_span: int,
    fetch_spec: tuple,  # ((span, j_lo, jg, (res...)), ...) per fetch
    grad_mode: str,
):
    """custom_vjp for the GROUPED hash-row lookup+combine
    (``HashGridEncoderGrouped``): fetch ``fid`` gathers row
    ``idx[fid*n + i]`` (an absolute row index, span offset included) and
    combines lanes of its active sub-level window ``[j_lo, j_lo+jg)``:
    ``out[fid*n + i, k*F + f] = sum_c w[i, j_lo+k, c] *
    table[idx, c*J*F + (j_lo+k)*F + f]`` where the trilinear corner
    weights come from each sub-level's own resolution fracs of the shared
    sample position.  SPLIT-KEY rows: fetches with different key grids
    may target the same span with disjoint windows — their gradients sum.
    The table gradient runs :func:`table_grad_factors_sorted_pos`
    (positions carried through the sort, fracs recomputed in-kernel).

    Same zero-positions-gradient contract as :func:`_sized_lookup_combine`
    — do NOT use where sample positions require gradients."""
    cdt = None if compute_dtype_name == "none" else jnp.dtype(
        compute_dtype_name
    )
    span = level_span or n_rows
    W = next((w for w in _window_candidates() if span % w == 0), None)
    JF = J * F
    lane = np.arange(_LANE)
    c_of = lane // JF
    j_of = (lane % JF) // F
    f_of = lane % F
    n_fetches = len(fetch_spec)
    JG = fetch_spec[0][2]
    assert all(fs[2] == JG for fs in fetch_spec)

    def plain(table, idx, xs, ys, zs):
        t = table if cdt is None else table.astype(cdt)
        g = jnp.take(t, idx, axis=0)  # (n_fetches*n, 128)
        n = xs.shape[0]
        bx = jnp.asarray((c_of >> 2) & 1, jnp.int32)
        by = jnp.asarray((c_of >> 1) & 1, jnp.int32)
        bz = jnp.asarray(c_of & 1, jnp.int32)
        outs = []
        for fid, fs in enumerate(fetch_spec):
            (_, j_lo, jg, res_fs) = fs[:4]
            key_k = fs[4] if len(fs) > 4 else None
            active = (j_of >= j_lo) & (j_of < j_lo + jg)
            # One-hot lane->feature reduction on the MXU (inactive lanes
            # map to no output column).
            S = (
                (active[:, None])
                & (((j_of - j_lo) * F + f_of)[:, None]
                   == np.arange(jg * F)[None, :])
            ).astype(np.float32)
            Sc = jnp.asarray(S, g.dtype)
            res_g = jnp.asarray(res_fs, jnp.float32)  # (jg,)
            xl = xs[:, None] * res_g[None, :]  # (n, jg) f32
            yl = ys[:, None] * res_g[None, :]
            zl = zs[:, None] * res_g[None, :]
            fx = xl - jnp.floor(xl)
            fy = yl - jnp.floor(yl)
            fz = zl - jnp.floor(zl)
            if os.environ.get("NERFACC_GROUPED_WB", "tri") == "tri":
                # CONTINUOUS periodic weights for non-key sub-levels: a
                # sawtooth frac makes every non-key sub-level's
                # contribution jump at its own lattice planes (features
                # are keyed elsewhere, so nothing cancels the jump) — a
                # triangle wave (distance-to-even-lattice) is the C0
                # replacement.  The KEY sub-level keeps true fracs: its
                # features change WITH its cells (corner-fused
                # semantics), so its trilerp is already consistent.
                kk_key = key_k if key_k is not None else -1
                def tri(t):
                    h = t * 0.5
                    return 1.0 - jnp.abs(2.0 * (h - jnp.floor(h)) - 1.0)
                sel = jnp.asarray(
                    [1.0 if k == kk_key else 0.0 for k in range(jg)],
                    jnp.float32,
                )[None, :]
                fx = sel * fx + (1 - sel) * tri(xl)
                fy = sel * fy + (1 - sel) * tri(yl)
                fz = sel * fz + (1 - sel) * tri(zl)

            def lanes(fr):
                # (n, jg) -> (n, 128): place sub-level k's frac on every
                # lane whose layout sub-level is j_lo + k (inactive lanes
                # get an arbitrary in-range frac; S zeroes them).
                kk = np.clip(j_of - j_lo, 0, jg - 1)
                return fr[:, kk]

            fxl, fyl, fzl = lanes(fx), lanes(fy), lanes(fz)
            mask = (
                jnp.where(bx == 1, fxl, 1.0 - fxl)
                * jnp.where(by == 1, fyl, 1.0 - fyl)
                * jnp.where(bz == 1, fzl, 1.0 - fzl)
            )
            gg = g[fid * n : (fid + 1) * n]
            prod = gg * mask.astype(gg.dtype)
            if os.environ.get("NERFACC_GCOMBINE", "mxu") == "sum":
                out = (
                    prod * jnp.asarray(active, prod.dtype)
                ).reshape(n, 8, JF).sum(axis=1)[
                    :, j_lo * F : (j_lo + jg) * F
                ]
            else:
                out = jax.lax.dot_general(
                    prod, Sc,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(gg.dtype)
            outs.append(out)
        return jnp.concatenate(outs, axis=0)  # (n_fetches*n, jg*F)

    fdt = jnp.bfloat16 if cdt is not None else jnp.float32
    if W is None or grad_mode != "factor" or fdt != jnp.bfloat16 \
            or (JG * F) % 2:
        # f32 compute keeps the autodiff scatter (bf16 dout columns would
        # silently halve the full-precision payload), as does an odd
        # payload width (no bf16 pairing).
        return plain

    @jax.custom_vjp
    def lookup_combine(table, idx, xs, ys, zs):
        return plain(table, idx, xs, ys, zs)

    def fwd(table, idx, xs, ys, zs):
        return lookup_combine(table, idx, xs, ys, zs), (idx, xs, ys, zs)

    def bwd(res_, dout):
        idx, xs, ys, zs = res_
        n = xs.shape[0]
        JgF = JG * F
        px = jax.lax.bitcast_convert_type(xs.astype(jnp.float32), jnp.int32)
        py = jax.lax.bitcast_convert_type(ys.astype(jnp.float32), jnp.int32)
        pz = jax.lax.bitcast_convert_type(zs.astype(jnp.float32), jnp.int32)
        dcols = jax.lax.bitcast_convert_type(
            dout.astype(jnp.bfloat16).reshape(idx.shape[0], JgF // 2, 2),
            jnp.int32,
        )  # (n_fetches*n, JgF/2)
        n_spans = n_rows // span
        span_parts = [[] for _ in range(n_spans)]
        for fid, fs in enumerate(fetch_spec):
            (sp, j_lo, jg, res_fs) = fs[:4]
            key_k = fs[4] if len(fs) > 4 else -1
            sl = slice(fid * n, (fid + 1) * n)
            sorted_ops = jax.lax.sort(
                (idx[sl] - sp * span, px, py, pz)
                + tuple(dcols[sl, c] for c in range(JgF // 2)),
                num_keys=1,
                is_stable=False,
            )
            pos_t = jax.lax.bitcast_convert_type(
                jnp.stack(sorted_ops[1:4], axis=0), jnp.float32
            )  # (3, n)
            dout_t = _unpack_bf16_pairs_t(
                jnp.stack(sorted_ops[4:], axis=0), JgF
            )
            span_parts[sp].append(
                table_grad_factors_sorted_pos(
                    sorted_ops[0], pos_t, dout_t,
                    n_rows=span, RES=tuple(res_fs),
                    F=F, J=J, J_LO=j_lo, JG=jg, KEY_K=key_k, W=W,
                    interpret=interpret,
                )
            )
        blocks = []
        for sp in range(n_spans):
            parts = span_parts[sp]
            if not parts:
                blocks.append(jnp.zeros((span, _LANE), jnp.float32))
            elif len(parts) == 1:
                blocks.append(parts[0])
            else:
                # Split-key fetches write DISJOINT lane sets of the same
                # span — the sum is exact lane-wise assembly.
                acc = parts[0]
                for p in parts[1:]:
                    acc = acc + p
                blocks.append(acc)
        dtable = blocks[0] if len(blocks) == 1 else jnp.concatenate(
            blocks, axis=0
        )
        return (
            dtable,
            None,
            jnp.zeros_like(xs),
            jnp.zeros_like(ys),
            jnp.zeros_like(zs),
        )

    lookup_combine.defvjp(fwd, bwd)
    return lookup_combine


def hash_lookup_combine_pos(
    table: Array,  # (n_spans*span, 128) f32 master table
    idx: Array,  # (n_fetches*n,) i32, fetch-major, ABSOLUTE row indices
    xs: Array,  # (n,) f32 sample positions in encoder [0,1] coords
    ys: Array,
    zs: Array,
    fetch_spec,  # ((span_idx, j_lo, jg, (res...)), ...) per fetch
    F: int = 2,
    compute_dtype=None,
    interpret: bool = False,
    level_span: int = 0,
    grad_mode: str = "factor",
) -> Array:
    """Grouped fused gather + multi-sub-level trilinear combine for the
    tcnn-shape encoder: each fetch serves ``jg`` levels from one 128-lane
    row; split-key fetches share a span with disjoint lane windows.
    Returns ``(n_fetches*n, jg*F)``.  ``grad_mode="factor"`` routes the
    table gradient through the positional sorted Pallas reduction (zero
    gradient to positions BY CONTRACT); ``"scatter"`` keeps autodiff."""
    assert table.ndim == 2 and table.shape[1] == _LANE
    J = _LANE // (8 * F)
    assert 8 * F * J == _LANE
    n_fetches = len(fetch_spec)
    assert idx.shape[0] == n_fetches * xs.shape[0]
    name = "none" if compute_dtype is None else jnp.dtype(compute_dtype).name
    spec = tuple(
        (int(fs[0]), int(fs[1]), int(fs[2]),
         tuple(float(r) for r in fs[3]))
        + ((int(fs[4]),) if len(fs) > 4 else ())
        for fs in fetch_spec
    )
    return _sized_lookup_combine_pos(
        int(table.shape[0]), int(F), int(J), name, interpret,
        int(level_span), spec, grad_mode,
    )(table, idx, xs, ys, zs)


def _cell_place_kernel(
    wid_ref,
    off_ref,
    first_ref,
    valid_ref,
    idx_hbm,  # (n_pad/128, 128) i32 in ANY
    val_hbm,  # (n_pad/128, 128) f32 in ANY
    out_ref,  # (WR, 128) f32 block
    idx_vmem,  # scratch (CH/128, 128) i32
    val_vmem,  # scratch (CH/128, 128) f32
    sems,  # DMA semaphores (2,)
    *,
    WC: int,  # cells per window (WC == WR * 128)
    CH: int,
):
    """Scalar cell placement: out[id >> 7, id & 127] += val, for sorted ids.

    The occupancy-update EMA needs a segment reduction into a FLAT cell
    table (2M scalar cells), not a (rows, 128) feature table — cells map to
    (sublane, lane) = (id // 128, id % 128) of the output block.  Each
    128-sample lane tile builds a (WR, 128-sample) row one-hot and a
    (128-sample, 128-lane) lane one-hot and reduces them with one MXU
    contraction; unique ids upstream (run-end dedup) make sum == place.
    """
    s = pl.program_id(0)
    off = pl.multiple_of(off_ref[s], CH)
    row0 = pl.multiple_of(off // _LANE, CH // _LANE)

    idx_dma = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(row0, CH // _LANE), :], idx_vmem, sems.at[0]
    )
    val_dma = pltpu.make_async_copy(
        val_hbm.at[pl.ds(row0, CH // _LANE), :], val_vmem, sems.at[1]
    )
    idx_dma.start()
    val_dma.start()
    idx_dma.wait()
    val_dma.wait()

    WR = WC // _LANE
    rows = jax.lax.broadcasted_iota(jnp.int32, (WR, _LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    c0 = wid_ref[s] * WC
    c0 = jnp.where(valid_ref[s] == 1, c0, -(WC + 1) * _LANE)
    mm = jnp.zeros((WR, _LANE), jnp.float32)
    for k in range(CH // _LANE):
        ids = idx_vmem[k, :] - c0  # (128,) relative cell ids
        rel_row = ids // _LANE
        rel_lane = ids % _LANE
        oh_r = (rel_row[None, :] == rows).astype(jnp.float32)  # (WR, 128s)
        # (128s, 128l) value placement; out-of-window rows already mask
        # via oh_r (rel_row outside [0, WR)).
        pl_l = (rel_lane[:, None] == lanes).astype(jnp.float32)
        pl_l = pl_l * val_vmem[k, :][:, None]
        # HIGHEST precision is load-bearing: at DEFAULT the MXU downcasts
        # the f32 operands to bf16, quantizing the biased values (val + 1)
        # to 2^-8 relative steps — which annihilates occupancy values of
        # ~1e-3 entirely and silently EMPTIES the grid (the round-4
        # quality collapse to a constant 13.23 dB).
        mm = mm + jax.lax.dot_general(
            oh_r, pl_l,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(first_ref[s] == 1)
    def _():
        out_ref[:] = mm

    @pl.when(first_ref[s] == 0)
    def _():
        out_ref[:] = out_ref[:] + mm


@functools.partial(
    jax.jit, static_argnames=("n_cells", "WC", "CH", "interpret")
)
def cell_max_sorted(
    ids: Array,  # (N,) i32 cell ids in [0, n_cells), any order
    vals: Array,  # (N,) f32, NON-NEGATIVE
    *,
    n_cells: int,
    WC: int = 32768,
    CH: int = 2048,
    interpret: bool = False,
) -> Array:
    """Per-cell max of ``vals`` grouped by ``ids``, returned as a flat
    ``(n_cells,)`` f32 array with ``-1.0`` for untouched cells — the exact
    contract of ``full(-1).at[ids].max(vals)`` (occ_grid.py EMA), built
    sort-first for TPU: sort 2 operands, segmented running max
    (associative_scan), place ``segmax + 1`` at run ends (unique ids), and
    reduce with the windowed one-hot MXU kernel; ``sum - 1`` restores the
    -1-fill semantics because every group contributes exactly one nonzero
    (>= 1) term.
    """
    assert n_cells % WC == 0 and WC % _LANE == 0
    n = ids.shape[0]
    # Unstable: max within a group is order-independent, so the stability
    # iota operand (a third carried sort column) buys nothing.
    sidx, svals = jax.lax.sort((ids, vals), num_keys=1, is_stable=False)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sidx[1:] != sidx[:-1]]
    )

    def comb(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, jnp.maximum(av, bv))

    _, runmax = jax.lax.associative_scan(comb, (first, svals))
    run_end = jnp.concatenate(
        [sidx[1:] != sidx[:-1], jnp.ones((1,), bool)]
    )
    placed = jnp.where(run_end, runmax + 1.0, 0.0)

    n_pad = -(-(n + CH) // CH) * CH
    sidx_p = jnp.concatenate(
        [sidx, jnp.full((n_pad - n,), n_cells, jnp.int32)]
    )
    placed_p = jnp.concatenate([placed, jnp.zeros((n_pad - n,), jnp.float32)])

    NW = n_cells // WC
    n_slots = 2 * NW + n_pad // CH
    wid, off, first_s, valid = _worklist(
        sidx_p, n_cells, WC, CH, n_slots, n_pad
    )
    kernel = functools.partial(_cell_place_kernel, WC=WC, CH=CH)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_slots,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (WC // _LANE, _LANE),
                lambda s, wid, off, first, valid: (wid[s], 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((CH // _LANE, _LANE), jnp.int32),
                pltpu.VMEM((CH // _LANE, _LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_cells // _LANE, _LANE), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_slots * CH * (WC // _LANE + _LANE),
            bytes_accessed=n_pad * 8 + n_cells * 4,
            transcendentals=0,
        ),
    )(
        wid, off, first_s, valid,
        sidx_p.reshape(-1, _LANE),
        placed_p.reshape(-1, _LANE),
    )
    return out.reshape(-1) - 1.0
