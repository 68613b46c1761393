"""Multi-level occupancy-grid ray traversal (vectorized, static shapes).

Parity target: ``nerfacc/grid.py`` (``ray_aabb_intersect``, ``traverse_grids``,
``_enlarge_aabb``, ``_query``) and the CUDA DDA kernel
``nerfacc/cuda/csrc/grid.cu:68-275``.

TPU design: the CUDA kernel is a per-ray *serial* Amanatides–Woo DDA with a
data-dependent output size (two-pass count/allocate/fill,
``grid.cu:405-471``).  Neither serial per-ray loops nor dynamic shapes map to
XLA, so traversal is reformulated as a fully vectorized two-stage pipeline
that preserves the sampling semantics:

1. **Ladder**: the reference's marching positions obey
   ``t_{k+1} = t_k + clamp(t_k * cone_angle, step_size, inf)``
   (``grid.cu:23-28``), which has a closed form — linear spacing until
   ``t = step_size/cone_angle``, geometric with ratio ``1+cone`` after.  We
   materialize the whole ladder (a static number of steps) for every ray.
2. **Query + compact**: each ladder midpoint is tested against the multi-level
   binary grid via the mip-selection rule of ``_query``
   (``nerfacc/grid.py:201-237``); valid samples are compacted left within each
   ray row by a cumsum + scatter (the vectorized equivalent of the CUDA
   count/fill passes), into a ``(n_rays, max_samples)`` buffer with an
   ``is_valid`` mask.

Divergence from CUDA (documented): when skipping long empty stretches with
``cone_angle > 0`` the CUDA kernel reuses a stale ``dt`` during the skip loop,
slightly desynchronizing its ladder; ours stays on the closed-form ladder.
Sample *placement in occupied cells* — the estimator contract checked by
``tests/test_grid.py:39-68`` — is preserved.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = [
    "ray_aabb_intersect",
    "traverse_grids",
    "TraversalResults",
]


def ray_aabb_intersect(
    rays_o: Array,
    rays_d: Array,
    aabbs: Array,
    near_plane: float = -float("inf"),
    far_plane: float = float("inf"),
    miss_value: float = float("inf"),
) -> Tuple[Array, Array, Array]:
    """Slab-test intersection of each ray against each AABB.

    Parity: ``nerfacc/grid.py:13-51`` / ``grid.cu:284-313``.  Embarrassingly
    parallel; pure jnp broadcasting (no kernel needed — XLA fuses this).

    Returns ``(t_mins, t_maxs, hits)`` each of shape ``(n_rays, m)``.
    """
    assert rays_o.ndim == 2 and rays_o.shape[-1] == 3
    assert rays_d.ndim == 2 and rays_d.shape[-1] == 3
    assert aabbs.ndim == 2 and aabbs.shape[-1] == 6

    aabb_min = aabbs[:, :3]  # (m, 3)
    aabb_max = aabbs[:, 3:]

    inv_d = 1.0 / rays_d  # inf-safe: IEEE gives +-inf, min/max handle it
    t1 = (aabb_min[None, :, :] - rays_o[:, None, :]) * inv_d[:, None, :]
    t2 = (aabb_max[None, :, :] - rays_o[:, None, :]) * inv_d[:, None, :]

    t_mins = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_maxs = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hits = (t_maxs > t_mins) & (t_maxs > 0)

    t_mins = jnp.clip(t_mins, min=near_plane, max=far_plane)
    t_maxs = jnp.clip(t_maxs, min=near_plane, max=far_plane)
    t_mins = jnp.where(hits, t_mins, miss_value)
    t_maxs = jnp.where(hits, t_maxs, miss_value)
    return t_mins, t_maxs, hits


def _enlarge_aabb(aabb, factor: float):
    """Scale an aabb about its center (``nerfacc/grid.py:195-198``)."""
    aabb = jnp.asarray(aabb)
    center = (aabb[:3] + aabb[3:]) / 2
    extent = (aabb[3:] - aabb[:3]) / 2
    return jnp.concatenate([center - extent * factor, center + extent * factor])


def _query_soa(
    px: Array,
    py: Array,
    pz: Array,
    data: Array,
    base_aabb: Array,
    mip_pad: int = 0,
) -> Tuple[Array, Array]:
    """Mip-level occupancy lookup, structure-of-arrays layout.

    Same semantics as :func:`_query` but takes per-axis coordinate arrays of
    any (matching) shape — on TPU a ``(..., 3)`` point tensor is tiled with a
    42x-padded minor dimension, so the hot traversal path keeps coordinates
    as separate arrays and gathers the grid through a flat 1-D index.

    ``mip_pad > 0`` unions the lookup over levels ``mip .. mip+pad`` — used
    by the macro-skip probes, whose conservatism would otherwise break when
    a probe and the samples it stands in for straddle a mip boundary.
    """
    shape = px.shape
    nx = (px - base_aabb[0]) / (base_aabb[3] - base_aabb[0]) - 0.5
    ny = (py - base_aabb[1]) / (base_aabb[4] - base_aabb[1]) - 0.5
    nz = (pz - base_aabb[2]) / (base_aabb[5] - base_aabb[2]) - 0.5

    maxval = jnp.maximum(jnp.maximum(jnp.abs(nx), jnp.abs(ny)), jnp.abs(nz))
    # frexp of ~0 yields exponent 0; clamp as the reference does.
    maxval = jnp.clip(maxval, min=0.1)
    _, exponent = jnp.frexp(maxval)
    mip = jnp.clip(exponent + 1, min=0)
    selector = mip < data.shape[0]

    levels, rx, ry, rz = data.shape
    flat = data.reshape(-1)

    out = None
    for dp in range(mip_pad + 1):
        mip_p = jnp.clip(mip + dp, max=levels - 1)
        inv_scale = jnp.exp2(-mip_p.astype(px.dtype))

        def cell(coord, r, s=inv_scale):
            i = ((coord * s + 0.5) * r).astype(jnp.int32)
            return jnp.clip(i, 0, r - 1)

        flat_idx = (
            ((mip_p * rx + cell(nx, rx)) * ry + cell(ny, ry)) * rz
            + cell(nz, rz)
        )
        vals = jnp.take(flat, flat_idx.reshape(-1)).reshape(shape)
        if out is None:
            out = vals
        elif vals.dtype == bool:
            out = out | vals
        else:
            out = jnp.maximum(out, vals)

    return (
        out & selector if out.dtype == bool else out * selector
    ), selector


def _query(x: Array, data: Array, base_aabb: Array) -> Tuple[Array, Array]:
    """Mip-level occupancy lookup for points in a 2x-nested multi-level grid.

    Parity: ``nerfacc/grid.py:201-237``.  ``data`` is ``(m, rx, ry, rz)``;
    ``base_aabb`` the level-0 box.  Returns ``(values, selector)`` where
    ``selector`` marks points inside the outermost level.  (AoS wrapper over
    :func:`_query_soa`.)
    """
    return _query_soa(x[..., 0], x[..., 1], x[..., 2], data, base_aabb)


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return (
            "tpu" in dev.platform.lower()
            or "tpu" in getattr(dev, "device_kind", "").lower()
        )
    except Exception:
        return False


def _query_dispatch(
    px: Array,
    py: Array,
    pz: Array,
    data: Array,
    base_aabb: Array,
    packed: Optional[Array],
    *,
    interpret: bool = False,
    mip_pad: int = 0,
) -> Array:
    """Occupancy query: Pallas VMEM kernel when a bit-packed grid is
    available (and we're on TPU), XLA gather otherwise.

    The Pallas path (``ops/occ_query.py``) answers queries from a
    VMEM-resident grid at ~4 ns/query vs ~10 ns for the XLA HBM gather
    (measured on v5e at 2M queries).  Multi-level grids run one kernel sweep
    per level (each level's box is the 2^l-enlarged base, matching
    ``OccGridEstimator``'s nesting) combined by the mip-selection rule of
    ``_query_soa`` — levels are <= 4 in practice, and the mip math is pure
    VPU arithmetic.
    """
    if packed is None or not (interpret or _on_tpu()):
        occ, _ = _query_soa(px, py, pz, data, base_aabb, mip_pad=mip_pad)
        return occ

    from .ops.occ_query import occupancy_query_pallas

    levels = data.shape[0]
    res = tuple(int(r) for r in data.shape[1:])
    if levels == 1:
        return occupancy_query_pallas(
            packed[0], base_aabb, px, py, pz,
            resolution=res, tm=256, interpret=interpret,
        )

    # Mip selection (same math as _query_soa).
    nx = (px - base_aabb[0]) / (base_aabb[3] - base_aabb[0]) - 0.5
    ny = (py - base_aabb[1]) / (base_aabb[4] - base_aabb[1]) - 0.5
    nz = (pz - base_aabb[2]) / (base_aabb[5] - base_aabb[2]) - 0.5
    maxval = jnp.maximum(jnp.maximum(jnp.abs(nx), jnp.abs(ny)), jnp.abs(nz))
    maxval = jnp.clip(maxval, min=0.1)
    _, exponent = jnp.frexp(maxval)
    mip = jnp.clip(exponent + 1, min=0)

    center = (base_aabb[:3] + base_aabb[3:]) / 2
    extent = (base_aabb[3:] - base_aabb[:3]) / 2
    occ = jnp.zeros(px.shape, bool)
    for lvl in range(levels):
        aabb_l = jnp.concatenate(
            [center - extent * (2**lvl), center + extent * (2**lvl)]
        )
        occ_l = occupancy_query_pallas(
            packed[lvl], aabb_l, px, py, pz,
            resolution=res, tm=256, interpret=interpret,
        )
        # Level lvl answers for points whose mip is in [lvl - mip_pad, lvl]
        # (mip_pad > 0 = the conservative union used by macro-skip probes).
        sel = (mip <= lvl) & (mip >= lvl - mip_pad)
        occ = occ | (occ_l & sel)
    return occ


def _march_ladder(
    near: Array, n_edges: int, step_size: float, cone_angle: float
) -> Array:
    """Closed form of the reference's marching recurrence ``_calc_dt``
    (``grid.cu:23-28``): ``t_{k+1} = t_k + clamp(t_k*cone, step, inf)``.

    Returns edge positions of shape ``near.shape + (n_edges,)``.
    """
    k = jnp.arange(n_edges, dtype=near.dtype)
    if cone_angle <= 0.0:
        return near[..., None] + k * step_size
    t_switch = step_size / cone_angle
    k_sw = jnp.ceil(jnp.maximum(t_switch - near, 0.0) / step_size)
    t_lin = near[..., None] + k * step_size
    t_at_sw = near + k_sw * step_size
    t_geo = t_at_sw[..., None] * jnp.power(
        1.0 + cone_angle, k - k_sw[..., None]
    )
    return jnp.where(k <= k_sw[..., None], t_lin, t_geo)


def _ladder_at(near: Array, k: Array, step_size: float, cone_angle: float) -> Array:
    """Ladder edge position at integer index ``k`` (closed form; see
    :func:`_march_ladder`).  ``near`` broadcasts against ``k``."""
    kf = k.astype(near.dtype)
    if cone_angle <= 0.0:
        return near + kf * step_size
    t_switch = step_size / cone_angle
    k_sw = jnp.ceil(jnp.maximum(t_switch - near, 0.0) / step_size)
    t_lin = near + kf * step_size
    t_at_sw = near + k_sw * step_size
    t_geo = t_at_sw * jnp.power(1.0 + cone_angle, kf - k_sw)
    return jnp.where(kf <= k_sw, t_lin, t_geo)


def num_ladder_steps(
    t_range: float, step_size: float, cone_angle: float, near: float = 0.0
) -> int:
    """Static upper bound on ladder steps needed to cover ``t_range`` from
    ``near`` (host-side helper for choosing the lattice length)."""
    if cone_angle <= 0.0:
        return max(1, int(math.ceil(t_range / step_size)))
    t_switch = step_size / cone_angle
    far = near + t_range
    n_lin = max(0.0, math.ceil((t_switch - near) / step_size))
    t_at_sw = near + n_lin * step_size
    if far <= t_at_sw:
        return max(1, int(math.ceil(t_range / step_size)))
    n_geo = math.ceil(
        math.log(max(far, 1e-9) / max(t_at_sw, step_size))
        / math.log1p(cone_angle)
    )
    return max(1, int(n_lin + max(0.0, n_geo) + 2))


def build_skip_grid(
    binaries: Array, factor: int = 4, dilation: int = 1
) -> Array:
    """Down-sampled + dilated occupancy for macro-segment skipping.

    ``binaries``: (m, rx, ry, rz) bool.  Returns (m, rx/f, ry/f, rz/f) bool
    where a macro cell is occupied iff any fine cell in its ``factor``-block
    or within ``dilation`` macro cells is occupied.  Rebuilt at occupancy
    updates (cheap max-pool) — the vectorized analogue of the DDA's
    empty-macro-region skipping.
    """
    m, rx, ry, rz = binaries.shape
    f = factor
    # The coarse grid shares the fine grid's aabb, so `factor` must divide
    # the resolution exactly — otherwise the cell mapping in `_query_soa`
    # would be misaligned.  OccGridEstimator picks a valid divisor itself.
    assert rx % f == 0 and ry % f == 0 and rz % f == 0, (
        f"build_skip_grid: factor {f} must divide resolution "
        f"({rx},{ry},{rz}); pick a common divisor (1 always works)"
    )
    coarse = binaries.reshape(m, rx // f, f, ry // f, f, rz // f, f).any(
        axis=(2, 4, 6)
    )
    # dilate by max-pooling with a (2d+1)^3 window
    for axis in (1, 2, 3):
        shifted = [coarse]
        for s in range(1, dilation + 1):
            pad_lo = [(0, 0)] * 4
            pad_hi = [(0, 0)] * 4
            pad_lo[axis] = (s, 0)
            pad_hi[axis] = (0, s)
            shifted.append(jnp.pad(coarse, pad_lo)[
                tuple(slice(None) if a != axis else slice(None, coarse.shape[axis])
                      for a in range(4))
            ])
            shifted.append(jnp.pad(coarse, pad_hi)[
                tuple(slice(None) if a != axis else slice(s, None)
                      for a in range(4))
            ])
        coarse = jnp.stack(shifted).any(axis=0)
    return coarse


class TraversalResults(NamedTuple):
    """Dense traversal output (the TPU replacement for the reference's packed
    ``RayIntervals``/``RaySamples`` pair; see module docstring)."""

    t_starts: Array  # (n_rays, max_samples)
    t_ends: Array  # (n_rays, max_samples)
    is_valid: Array  # (n_rays, max_samples) bool
    termination_planes: Array  # (n_rays,)
    num_valid: Array  # (n_rays,) int32 — samples emitted (capped at capacity)
    far_effective: Array  # (n_rays,) min(far_plane, outermost-grid exit)


class CompactSamples(NamedTuple):
    """Flat compacted samples straight from the traversal lattice.

    ``ray_indices`` is globally sorted (ascending; capacity padding decodes
    to the last ray with ``kept=False``), and ``seg_starts``/``seg_counts``
    give each ray's chunk-aligned slot range — consumers can therefore
    accumulate per-ray sums with a cumulative sum + two boundary gathers
    instead of a scatter-add (see ``volrend.rendering(seg_bounds=...)``).
    """

    ray_indices: Array  # (capacity,) int32, sorted ascending
    t_starts: Array  # (capacity,)
    t_ends: Array  # (capacity,)
    kept: Array  # (capacity,) bool
    num_valid: Array  # (n_rays,)
    termination_planes: Array  # (n_rays,)
    far_effective: Array  # (n_rays,)
    seg_starts: Array  # (n_rays,) int32 first slot of each ray's samples
    seg_counts: Array  # (n_rays,) int32 slots spanned (chunk-aligned)
    # Rays that crossed more occupied macro segments than the
    # ``max_macro_segments`` budget — their tail samples were dropped
    # (silent quality loss if ignored; the CUDA DDA never truncates,
    # grid.cu:184-272).  Always False when macro-skip is off.
    macro_truncated: Array  # (n_rays,) bool
    # Per-sample ray origin/direction components carried through the
    # compaction sort (``carry_rays=``): ((ox,oy,oz), (dx,dy,dz)) 1-D
    # ``(capacity,)`` arrays, or None.  SoA by design — a ``(capacity, 3)``
    # materialization would pay 42x lane padding on TPU.
    ray_comps: Optional[Tuple] = None


def traverse_and_compact(
    rays_o: Array,
    rays_d: Array,
    binaries: Array,
    aabbs: Array,
    capacity: int,
    near_planes: Optional[Array] = None,
    far_planes: Optional[Array] = None,
    step_size: float = 1e-3,
    cone_angle: float = 0.0,
    traverse_steps_limit: Optional[int] = None,
    rays_mask: Optional[Array] = None,
    *,
    max_lattice_steps: int = 1024,
    base_aabb: Optional[Array] = None,
    skip_grid: Optional[Array] = None,
    macro_stride: int = 16,
    max_macro_segments: int = 16,
    packed_grids: Optional[Array] = None,
    packed_skip: Optional[Array] = None,
    pallas_interpret: bool = False,
    compact_chunk: int = 4,
    carry_rays: bool = False,
) -> CompactSamples:
    """Fused traversal + global compaction (the training hot path).

    :func:`traverse_grids` materializes row-compacted ``(n_rays, row_cap)``
    buffers via two big scatters (~2 x n_rays x row_cap scatter indices —
    the dominant traversal cost measured on v5e).  Here compaction goes
    straight from the lattice mask to the flat ``capacity`` output with two
    binary searches per output slot (log(n_rays) + log(row_cap) gathers —
    ~5x fewer indexed ops), and sample positions come from the closed-form
    ladder instead of stored edges.
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    row_limit = traverse_steps_limit or max_lattice_steps

    if near_planes is None:
        near_planes = jnp.zeros((n_rays,), dtype)
    if far_planes is None:
        far_planes = jnp.full((n_rays,), jnp.inf, dtype)
    if base_aabb is None:
        base_aabb = aabbs[0]

    t_mins, t_maxs, hits = ray_aabb_intersect(rays_o, rays_d, aabbs)
    t_enter = jnp.min(jnp.where(hits, t_mins, jnp.inf), axis=-1)
    t_exit = jnp.max(jnp.where(hits, t_maxs, -jnp.inf), axis=-1)
    any_hit = jnp.any(hits, axis=-1)
    near = jnp.maximum(near_planes, 0.0)
    far = jnp.minimum(far_planes, jnp.where(any_hit, t_exit, near_planes))
    if rays_mask is not None:
        any_hit = any_hit & rays_mask
    lower = jnp.maximum(near, t_enter)

    examined_end = None
    if skip_grid is not None:
        m_segs = -(-max_lattice_steps // macro_stride)
        k_keep = max_macro_segments

        # Closed-form segment bounds on the (possibly geometric) ladder.
        seg_k = jnp.arange(m_segs, dtype=jnp.int32) * macro_stride
        seg_lo = _ladder_at(near[:, None], seg_k, step_size, cone_angle)
        seg_hi = _ladder_at(
            near[:, None], seg_k + macro_stride, step_size, cone_angle
        )
        # Uniform ladder: the midpoint query is conservative (stride is
        # sized against the dilated skip cell).  Geometric ladder (cone):
        # segment spans grow ~ cone * t while mip cells grow ~ t too, so a
        # fixed number of probes per segment keeps the test conservative.
        offsets = (0.5,) if cone_angle <= 0.0 else (0.125, 0.375, 0.625, 0.875)
        mocc = None
        for off in offsets:
            tm = seg_lo + (seg_hi - seg_lo) * off
            mx = rays_o[:, 0:1] + tm * rays_d[:, 0:1]
            my = rays_o[:, 1:2] + tm * rays_d[:, 1:2]
            mz = rays_o[:, 2:3] + tm * rays_d[:, 2:3]
            o = _query_dispatch(
                mx, my, mz, skip_grid, base_aabb, packed_skip,
                interpret=pallas_interpret, mip_pad=1,
            )
            mocc = o if mocc is None else (mocc | o)
        macro_valid = (
            mocc
            & (seg_hi > lower[:, None])
            & (seg_lo < far[:, None])
            & any_hit[:, None]
        )
        mcum = jnp.cumsum(macro_valid.astype(jnp.int32), axis=-1)
        # First-K selection WITHOUT a scatter (round 3, VERDICT #3): the
        # k-th (0-based) valid segment sits at column j iff mcum[j] == k+1
        # first occurs there, i.e. j = |{c : mcum[c] < k+1}| — so the whole
        # (n_rays, K) selection is one broadcast-compare-reduce over the
        # (n_rays, m_segs, K) product, fully fused by XLA.  Rays with fewer
        # than k+1 valid segments count to m_segs = the live-mask sentinel.
        # Replaces a 1-D scatter of n_rays*m_segs indices (~1M at the bench
        # config) that traced at 4.4 ms; scatter lowering is serial on TPU
        # while this is pure VPU reduction.
        kr = jnp.arange(1, k_keep + 1, dtype=jnp.int32)
        seg_idx = jnp.sum(
            (mcum[:, :, None] < kr[None, None, :]).astype(jnp.int32),
            axis=1,
        )  # (n_rays, K)
        seg_live = seg_idx < m_segs
        seg_idx = jnp.minimum(seg_idx, m_segs - 1)
        macro_truncated = mcum[:, -1] > k_keep
        last_seg = jnp.max(jnp.where(seg_live, seg_idx, 0), axis=-1)
        macro_end = _ladder_at(
            near, (last_seg + 1) * macro_stride, step_size, cone_angle
        )
        examined_end = jnp.where(
            macro_truncated, macro_end, jnp.full_like(near, jnp.inf)
        )

        lat = (
            seg_idx[:, :, None] * macro_stride
            + jnp.arange(macro_stride, dtype=jnp.int32)
        ).reshape(n_rays, k_keep * macro_stride)
        lat = jnp.minimum(lat, max_lattice_steps)
        t0_m = _ladder_at(near[:, None], lat, step_size, cone_angle)
        t1_m = _ladder_at(near[:, None], lat + 1, step_size, cone_angle)
        t_mid = (t0_m + t1_m) * 0.5
        live = jnp.repeat(seg_live, macro_stride, axis=-1)
        lattice_end = _ladder_at(
            near,
            jnp.full((n_rays,), max_lattice_steps, jnp.int32),
            step_size,
            cone_angle,
        )
        width = k_keep * macro_stride
    else:
        width = max_lattice_steps
        lat = jnp.broadcast_to(
            jnp.arange(width, dtype=jnp.int32), (n_rays, width)
        )
        t0_full = _ladder_at(near[:, None], lat, step_size, cone_angle)
        t1_full = _ladder_at(near[:, None], lat + 1, step_size, cone_angle)
        t_mid = (t0_full + t1_full) * 0.5
        live = None
        macro_truncated = jnp.zeros((n_rays,), bool)
        lattice_end = _ladder_at(
            near, jnp.full((n_rays,), width, jnp.int32), step_size, cone_angle
        )

    px = rays_o[:, 0:1] + t_mid * rays_d[:, 0:1]
    py = rays_o[:, 1:2] + t_mid * rays_d[:, 1:2]
    pz = rays_o[:, 2:3] + t_mid * rays_d[:, 2:3]
    occ = _query_dispatch(
        px, py, pz, binaries, base_aabb, packed_grids,
        interpret=pallas_interpret,
    )
    valid = (
        occ
        & (t_mid >= lower[:, None])
        & (t_mid < far[:, None])
        & any_hit[:, None]
    )
    if live is not None:
        valid = valid & live

    vcum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    counts = jnp.minimum(vcum[:, -1], row_limit)

    # Global compaction by forward map at CHUNK granularity: group the
    # lattice into runs of `C` consecutive steps, scatter one packed int32
    # per chunk that has any in-budget sample (C x fewer scatter indices —
    # the scatter is the dominant compaction cost at ~8 ns/index on v5e),
    # then expand chunks to samples with pure arithmetic.  The pack layout
    # is [row | base_lattice_step | C valid bits]; partially-valid chunks
    # surface their invalid samples as kept=False zero-length intervals.
    C = compact_chunk
    width = lat.shape[1]
    bits_p = max(1, int(max_lattice_steps + 1).bit_length())
    # Chunking requires aligned shapes (chunks may not straddle macro
    # segments) and int32 headroom; otherwise degrade to per-sample (C=1).
    if (
        width % C != 0
        or capacity % C != 0
        or (skip_grid is not None and macro_stride % C)
        or n_rays >= (1 << (31 - bits_p - C))
    ):
        C = 1
    assert n_rays < (1 << (31 - bits_p - C)), (
        "too many rays for packed compaction"
    )
    nch = width // C
    cap_c = capacity // C
    in_budget = valid & (vcum <= row_limit)
    ib4 = in_budget.reshape(n_rays, nch, C)
    cvalid = ib4.any(axis=-1)
    ccum = jnp.cumsum(cvalid.astype(jnp.int32), axis=-1)
    ccounts = ccum[:, -1]
    ccum0 = jnp.cumsum(ccounts) - ccounts
    ctotal = ccum0[-1] + ccounts[-1]
    # Invalid chunks get DISTINCT out-of-bounds slots (dropped) so the
    # whole index vector is provably unique — unique_indices=True lets XLA
    # lower the scatter as a plain permutation write instead of the
    # dedup-capable path (the duplicate-sentinel form measured ~21
    # ns/index on v5e, trace fusion.6).
    flat_pos = (
        jnp.arange(n_rays * nch, dtype=jnp.int32).reshape(n_rays, nch)
    )
    slot = jnp.where(cvalid, ccum0[:, None] + ccum - 1, cap_c + flat_pos)
    vbits = (
        ib4.astype(jnp.int32) << jnp.arange(C, dtype=jnp.int32)
    ).sum(axis=-1)
    base_lat = lat.reshape(n_rays, nch, C)[:, :, 0]
    rows_ch = jnp.broadcast_to(
        jnp.arange(n_rays, dtype=jnp.int32)[:, None], (n_rays, nch)
    )
    packed = (rows_ch << (bits_p + C)) | (base_lat << C) | vbits
    # Padding decodes to (last ray, clamped lattice end, no valid bits):
    # kept=False, t_start==t_end, and ray_indices stays globally sorted.
    fill_packed = ((n_rays - 1) << (bits_p + C)) | (max_lattice_steps << C)
    if os.environ.get("NERFACC_COMPACT_IMPL", "sort") == "sort":
        # Sort-based inversion, the DEFAULT since the round-3 device A/B
        # (8.02M vs 7.44M samples/s on v5e; scatter stays as the
        # NERFACC_COMPACT_IMPL=scatter fallback): valid chunks key
        # by their output slot (< ctotal <= cap_c), invalid chunks by
        # unique tail keys (>= cap_c), so one sort_key_val of n_rays*nch
        # int32 pairs lands every chunk in place — XLA's TPU scatter
        # lowering is serial per index (traced 20.8 ns/index in this
        # fusion) while its bitonic sort is parallel.
        keys = slot.reshape(-1)
        vals = packed.reshape(-1)
        # Carry each chunk's near-plane THROUGH the sort as a bitcast
        # third operand (~n_rays*nch extra int32 through the merge network)
        # so the decode below needs NO per-chunk near gather at all — the
        # same carry-beats-gather physics as the factor-carry table
        # gradient.  The row is known pre-sort (rows_ch), so this is free
        # information the scatter path must re-derive with a gather.
        carry_cols = [near]
        if carry_rays:
            # Ray origin/direction components ride the same sort (6 more
            # i32 operands on n_rays*nch elements) so the field never
            # gathers rays_o/rays_d per sample downstream.
            carry_cols += [rays_o[:, k] for k in range(3)]
            carry_cols += [rays_d[:, k] for k in range(3)]
        carried, fills = [], []
        for col in carry_cols:
            fills.append(jax.lax.bitcast_convert_type(col[-1], jnp.int32))
            carried.append(
                jax.lax.bitcast_convert_type(
                    jnp.broadcast_to(col[:, None], (n_rays, nch)), jnp.int32
                ).reshape(-1)
            )
        if keys.shape[0] < cap_c:  # capacity exceeds the chunk count
            pad = cap_c - keys.shape[0]
            keys = jnp.concatenate(
                [keys, jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)]
            )
            vals = jnp.concatenate(
                [vals, jnp.full((pad,), fill_packed, jnp.int32)]
            )
            carried = [
                jnp.concatenate([c, jnp.full((pad,), f, jnp.int32)])
                for c, f in zip(carried, fills)
            ]
        # Unstable: slot keys are unique by construction (valid chunks get
        # distinct output slots, invalid ones distinct tail keys), so the
        # stability iota JAX would append is a pure extra operand through
        # the merge network (round-5 trace: this sort carried 4 operands
        # for 3 requested).
        sorted_ops = jax.lax.sort(
            (keys, vals, *carried), num_keys=1, is_stable=False
        )
        packed_sorted = sorted_ops[1]
        live_c = jnp.arange(cap_c, dtype=jnp.int32) < ctotal
        inv = jnp.where(live_c, packed_sorted[:cap_c], fill_packed)
        carried_c = [
            jax.lax.bitcast_convert_type(
                jnp.where(live_c, s[:cap_c], f), jnp.float32
            )
            for s, f in zip(sorted_ops[2:], fills)
        ]
        near_c = carried_c[0]
        rays_c = carried_c[1:] or None
    else:
        near_c = None
        rays_c = None
        inv = (
            jnp.full((cap_c,), fill_packed, jnp.int32)
            .at[slot.reshape(-1)]
            .set(packed.reshape(-1), mode="drop", unique_indices=True)
        )
    r_c = inv >> (bits_p + C)
    base = (inv >> C) & ((1 << bits_p) - 1)
    vb = inv & ((1 << C) - 1)
    off = jnp.tile(jnp.arange(C, dtype=jnp.int32), cap_c)
    r = jnp.repeat(r_c, C)
    p = jnp.minimum(jnp.repeat(base, C) + off, max_lattice_steps)
    vbit = (jnp.repeat(vb, C) >> off) & 1
    kept = jnp.repeat(jnp.arange(cap_c, dtype=jnp.int32) < ctotal, C) & (
        vbit == 1
    )
    if near_c is None:  # scatter path: re-derive near by chunk gather
        # NERFACC_NEAR_BARRIER=1 stops XLA fusing the repeat INTO the
        # gather (which turns cap_c chunk indices into capacity per-sample
        # indices).  MEASURED NEUTRAL on device (round-4 A/B: 44.69 vs
        # 44.67 ms) despite the 4x index count, so the default stays off.
        near_c = jnp.take(near, r_c, indices_are_sorted=True)
        if os.environ.get("NERFACC_NEAR_BARRIER", "0") == "1":
            near_c = jax.lax.optimization_barrier(near_c)
    near_r = jnp.repeat(near_c, C)
    t_starts = _ladder_at(near_r, p, step_size, cone_angle)
    t_ends = _ladder_at(near_r, p + 1, step_size, cone_angle)
    t_ends = jnp.where(kept, t_ends, t_starts)

    # Termination planes (same semantics as traverse_grids).
    hit_cap = vcum[:, -1] >= row_limit
    # end of the last *kept* sample per ray
    last_col = jnp.argmax(
        jnp.where(valid & (vcum <= row_limit), vcum, -1), axis=-1
    )
    last_p = jnp.take_along_axis(lat, last_col[:, None], axis=1)[:, 0]
    last_end = _ladder_at(near, last_p + 1, step_size, cone_angle)
    examined = jnp.minimum(lattice_end, far)
    if examined_end is not None:
        examined = jnp.minimum(examined, examined_end)
    term = jnp.where(hit_cap, last_end, jnp.maximum(examined, near))

    # Per-ray slot ranges in sample units (chunk-aligned; rays whose chunks
    # overflowed the capacity are clamped — those samples were dropped).
    seg_lo_c = jnp.minimum(ccum0, cap_c)
    seg_hi_c = jnp.minimum(ccum0 + ccounts, cap_c)
    ray_comps = None
    if rays_c is not None:
        comps = [jnp.repeat(c, C) for c in rays_c]
        ray_comps = (tuple(comps[:3]), tuple(comps[3:]))
    return CompactSamples(
        ray_indices=r,
        t_starts=t_starts,
        t_ends=t_ends,
        kept=kept,
        num_valid=counts,
        termination_planes=term,
        far_effective=far,
        seg_starts=seg_lo_c * C,
        seg_counts=(seg_hi_c - seg_lo_c) * C,
        macro_truncated=macro_truncated,
        ray_comps=ray_comps,
    )


def traverse_grids(
    rays_o: Array,  # (n_rays, 3)
    rays_d: Array,  # (n_rays, 3)
    binaries: Array,  # (m, rx, ry, rz) bool
    aabbs: Array,  # (m, 6)
    near_planes: Optional[Array] = None,
    far_planes: Optional[Array] = None,
    step_size: float = 1e-3,
    cone_angle: float = 0.0,
    traverse_steps_limit: Optional[int] = None,
    rays_mask: Optional[Array] = None,
    *,
    max_lattice_steps: int = 1024,
    base_aabb: Optional[Array] = None,
    skip_grid: Optional[Array] = None,
    skip_factor: int = 4,
    macro_stride: int = 16,
    max_macro_segments: int = 16,
    packed_grids: Optional[Array] = None,
    packed_skip: Optional[Array] = None,
    pallas_interpret: bool = False,
) -> TraversalResults:
    """Vectorized multi-level grid traversal (see module docstring).

    Parity: ``nerfacc/grid.py:93-192`` + ``grid.cu`` kernel, over-allocate
    semantics (``grid.cu:364-404``): outputs have the static capacity
    ``traverse_steps_limit`` (default ``max_lattice_steps``) with ``is_valid``
    masking; invalid slots carry ``t_start == t_end`` so they are exact no-ops
    in the density rendering path.

    ``max_lattice_steps`` is the static number of marching steps evaluated per
    ray (choose via :func:`num_ladder_steps` to cover the scene extent).
    ``base_aabb`` defaults to ``aabbs[0]`` (levels are assumed 2x-nested, as
    produced by :class:`~nerfacc_tpu.estimators.occ_grid.OccGridEstimator`).
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    capacity = traverse_steps_limit or max_lattice_steps

    if near_planes is None:
        near_planes = jnp.zeros((n_rays,), dtype)
    if far_planes is None:
        far_planes = jnp.full((n_rays,), jnp.inf, dtype)
    if base_aabb is None:
        base_aabb = aabbs[0]

    # Clamp the march window to the outermost grid's extent.
    t_mins, t_maxs, hits = ray_aabb_intersect(rays_o, rays_d, aabbs)
    t_enter = jnp.min(jnp.where(hits, t_mins, jnp.inf), axis=-1)
    t_exit = jnp.max(jnp.where(hits, t_maxs, -jnp.inf), axis=-1)
    any_hit = jnp.any(hits, axis=-1)

    near = jnp.maximum(near_planes, 0.0)
    far = jnp.minimum(far_planes, jnp.where(any_hit, t_exit, near_planes))
    if rays_mask is not None:
        any_hit = any_hit & rays_mask

    lower = jnp.maximum(near, t_enter)
    examined_end = None  # how far marching looked (for termination planes)

    if skip_grid is not None:
        # --- Hierarchical stage 1: macro-skip + fine refine. -------------
        # The vectorized analogue of the CUDA DDA's empty-space skipping:
        # a coarse dilated grid prunes macro segments of `macro_stride`
        # steps, then only the first `max_macro_segments` live segments per
        # ray are refined at full resolution — shrinking every downstream
        # array by ~L / (K * stride).  Closed-form ladder bounds make this
        # work for the geometric (cone-angle) ladder too; there multiple
        # probes per segment keep the occupancy test conservative (segment
        # span and mip cell size both grow ~ t).
        m_segs = -(-max_lattice_steps // macro_stride)
        k_keep = max_macro_segments

        seg_k = jnp.arange(m_segs, dtype=jnp.int32) * macro_stride
        seg_lo = _ladder_at(near[:, None], seg_k, step_size, cone_angle)
        seg_hi = _ladder_at(
            near[:, None], seg_k + macro_stride, step_size, cone_angle
        )
        offsets = (0.5,) if cone_angle <= 0.0 else (0.125, 0.375, 0.625, 0.875)
        mocc = None
        for off in offsets:
            tm = seg_lo + (seg_hi - seg_lo) * off
            mx = rays_o[:, 0:1] + tm * rays_d[:, 0:1]
            my = rays_o[:, 1:2] + tm * rays_d[:, 1:2]
            mz = rays_o[:, 2:3] + tm * rays_d[:, 2:3]
            o = _query_dispatch(
                mx, my, mz, skip_grid, base_aabb, packed_skip,
                interpret=pallas_interpret, mip_pad=1,
            )
            mocc = o if mocc is None else (mocc | o)
        macro_valid = (
            mocc
            & (seg_hi > lower[:, None])
            & (seg_lo < far[:, None])
            & any_hit[:, None]
        )

        mcum = jnp.cumsum(macro_valid.astype(jnp.int32), axis=-1)
        mslot = jnp.where(
            macro_valid & (mcum <= k_keep), mcum - 1, k_keep
        )
        mrows = jnp.broadcast_to(
            jnp.arange(n_rays, dtype=jnp.int32)[:, None], mslot.shape
        )
        seg_idx = (
            jnp.full((n_rays, k_keep), m_segs, jnp.int32)
            .at[mrows, mslot]
            .set(
                jnp.broadcast_to(
                    jnp.arange(m_segs, dtype=jnp.int32), mslot.shape
                ),
                mode="drop",
            )
        )
        seg_live = seg_idx < m_segs
        macro_truncated = mcum[:, -1] > k_keep
        # Resumption point when macro-truncated: end of the last kept seg.
        last_seg = jnp.max(jnp.where(seg_live, seg_idx, 0), axis=-1)
        macro_end = _ladder_at(
            near, (last_seg + 1) * macro_stride, step_size, cone_angle
        )
        examined_end = jnp.where(
            macro_truncated, macro_end, jnp.full_like(near, jnp.inf)
        )

        # Fine lattice over kept segments only: (n, K*stride).
        p = (
            seg_idx[:, :, None] * macro_stride
            + jnp.arange(macro_stride, dtype=jnp.int32)
        ).reshape(n_rays, k_keep * macro_stride)
        p = jnp.minimum(p, max_lattice_steps)
        t0 = _ladder_at(near[:, None], p, step_size, cone_angle)
        t1 = _ladder_at(near[:, None], p + 1, step_size, cone_angle)
        t_mid = (t0 + t1) * 0.5
        seg_live_fine = jnp.repeat(seg_live, macro_stride, axis=-1)
        lattice_end = _ladder_at(
            near,
            jnp.full((n_rays,), max_lattice_steps, jnp.int32),
            step_size,
            cone_angle,
        )
    else:
        # --- Dense stage 1: full ladder (SoA per-axis arrays — a
        # (n_rays, L, 3) tensor would tile with a 42x-padded minor dim).
        edges = _march_ladder(near, max_lattice_steps + 1, step_size, cone_angle)
        t0 = edges[:, :-1]  # (n_rays, L)
        t1 = edges[:, 1:]
        t_mid = (t0 + t1) * 0.5
        seg_live_fine = None
        lattice_end = edges[:, -1]

    px = rays_o[:, 0:1] + t_mid * rays_d[:, 0:1]
    py = rays_o[:, 1:2] + t_mid * rays_d[:, 1:2]
    pz = rays_o[:, 2:3] + t_mid * rays_d[:, 2:3]
    occ = _query_dispatch(
        px, py, pz, binaries, base_aabb, packed_grids,
        interpret=pallas_interpret,
    )

    inside = (t_mid >= lower[:, None]) & (t_mid < far[:, None])
    valid = occ & inside & any_hit[:, None]
    if seg_live_fine is not None:
        valid = valid & seg_live_fine

    # Stage 2: per-row compaction (count pass + fill pass, vectorized).
    vcum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    slot = jnp.where(valid & (vcum <= capacity), vcum - 1, capacity)
    rows = jnp.arange(n_rays, dtype=jnp.int32)[:, None]
    rows = jnp.broadcast_to(rows, slot.shape)

    zeros = jnp.zeros((n_rays, capacity), dtype)
    t_starts = zeros.at[rows, slot].set(t0, mode="drop")
    t_ends = zeros.at[rows, slot].set(t1, mode="drop")

    num_valid = jnp.minimum(vcum[:, -1], capacity)
    is_valid = jnp.arange(capacity, dtype=jnp.int32) < num_valid[:, None]

    # Termination plane: where marching stopped (``grid.cu:274-275``) —
    # the end of the last emitted sample when the capacity was hit, else how
    # far the (possibly windowed) lattice actually examined.  A later round
    # resumes from here (the iterative test-mode renderer, §3.4).
    hit_cap = vcum[:, -1] >= capacity
    last_end = jnp.max(t_ends, axis=-1)
    examined = jnp.minimum(lattice_end, far)
    if examined_end is not None:
        examined = jnp.minimum(examined, examined_end)
    term = jnp.where(hit_cap, last_end, jnp.maximum(examined, near))

    # Park invalid slots at t_start == t_end == termination (exact no-ops).
    t_starts = jnp.where(is_valid, t_starts, term[:, None])
    t_ends = jnp.where(is_valid, t_ends, term[:, None])

    return TraversalResults(
        t_starts=t_starts,
        t_ends=t_ends,
        is_valid=is_valid,
        termination_planes=term,
        num_valid=num_valid,
        far_effective=far,
    )
