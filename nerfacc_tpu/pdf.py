"""Inverse-CDF importance sampling and segmented searchsorted.

Parity target: ``nerfacc/pdf.py`` + ``nerfacc/cuda/csrc/pdf.cu``.

TPU design: the CUDA kernels are per-output binary searches; here each ray row
is a vectorized ``jnp.searchsorted`` under ``vmap`` (XLA lowers batched
searchsorted to parallel compares — no kernel needed).  Per-ray Philox jitter
(``pdf.cu:138-145``) becomes a ``jax.random`` per-ray uniform draw.

The primary layout is batched ``(n_rays, n_edges)`` (that is all the PropNet
estimator uses — ``prop_net.py:96-120``); the flat layout delegates per-ray
via gather/scatter with static capacities.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .data_specs import RayIntervals, RaySamples

Array = jnp.ndarray

__all__ = ["searchsorted", "importance_sampling"]


def _searchsorted_clamped(sorted_vals: Array, values: Array) -> Tuple[Array, Array]:
    """Row-wise upper-bound with the reference's clamping.

    Implements ``pdf.cu:245-286``: ``p = upper_bound(row[:-1], v)`` then
    ``ids_left = max(p-1, 0)``, ``ids_right = min(p, n-1)``.  Both arrays are
    ``(..., n)``; returns per-row indices.
    """
    n = sorted_vals.shape[-1]

    def row(a, v):
        p = jnp.searchsorted(a, v, side="right")
        p = jnp.minimum(p, n - 1)
        return jnp.maximum(p - 1, 0), p

    flat_a = sorted_vals.reshape((-1, n))
    flat_v = values.reshape((-1, values.shape[-1]))
    ids_l, ids_r = jax.vmap(row)(flat_a, flat_v)
    ids_l = ids_l.reshape(values.shape)
    ids_r = ids_r.reshape(values.shape)
    return ids_l, ids_r


def searchsorted(
    sorted_sequence: Union[RayIntervals, RaySamples],
    values: Union[RayIntervals, RaySamples],
) -> Tuple[Array, Array]:
    """Segmented searchsorted (``nerfacc/pdf.py:13-62``).

    Returns ``(ids_left, ids_right)`` with
    ``sorted.vals[..., ids_left] <= values.vals < sorted.vals[..., ids_right]``
    (clamped to the valid range).  Batched mode returns per-row indices
    (suitable for ``take_along_axis``); flat mode returns flat indices into
    ``sorted_sequence.vals`` (the reference's flat convention).
    """
    if sorted_sequence.is_batched and values.is_batched:
        return _searchsorted_clamped(sorted_sequence.vals, values.vals)
    return _searchsorted_flat(sorted_sequence, values)


def _searchsorted_flat(key, query) -> Tuple[Array, Array]:
    """Flat segmented searchsorted via vectorized per-query binary search.

    ``key``/``query`` carry flat ``vals`` with ``packed_info`` (chunk start,
    count).  Mirrors ``searchsorted_kernel`` (``pdf.cu:245-286``): the search
    range is ``[base, last)`` of the query's ray chunk in the key, and the
    returned ids are flat indices clamped to ``[base, last]``.
    """
    assert query.packed_info is not None and key.packed_info is not None
    qvals = query.vals
    kvals = key.vals
    nq = qvals.shape[0]

    # ray id of each query element
    q_starts = query.packed_info[:, 0]
    ray_id = (
        jnp.searchsorted(q_starts, jnp.arange(nq, dtype=q_starts.dtype),
                         side="right").astype(jnp.int32) - 1
    )
    ray_id = jnp.clip(ray_id, 0, query.packed_info.shape[0] - 1)

    base = jnp.take(key.packed_info[:, 0], ray_id).astype(jnp.int32)
    cnt = jnp.take(key.packed_info[:, 1], ray_id).astype(jnp.int32)
    last = base + jnp.maximum(cnt - 1, 0)

    # upper bound over [base, last): smallest p with key[p] > v
    lo = base
    hi = last  # exclusive end of the search range
    max_cnt = int(kvals.shape[0])
    n_iter = max(1, max_cnt.bit_length())
    v = qvals
    for _ in range(n_iter):
        mid = (lo + hi) // 2
        km = jnp.take(kvals, jnp.clip(mid, 0, kvals.shape[0] - 1))
        go_right = (km <= v) & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    p = lo
    ids_right = jnp.clip(p, base, last)
    ids_left = jnp.clip(p - 1, base, last)
    return ids_left, ids_right


def importance_sampling(
    intervals: RayIntervals,
    cdfs: Array,
    n_intervals_per_ray: Union[int, Array],
    stratified: bool = False,
    key: Optional[jax.Array] = None,
    max_intervals_per_ray: Optional[int] = None,
    max_edges_per_ray: Optional[int] = None,
) -> Tuple[RayIntervals, RaySamples]:
    """Inverse-transform resampling of intervals given CDF values at edges.

    Parity: ``nerfacc/pdf.py:65-131`` batched overload
    (``pdf.cu:359-421`` + ``importance_sampling_kernel`` /
    ``compute_intervels_kernel``).  ``n_intervals_per_ray`` must be a static
    int (the Tensor-per-ray variant is served by the static capacity + mask
    layout elsewhere).

    Returns ``(intervals (n_rays, n+1), samples (n_rays, n))``.

    Per-ray-count variant (the reference's Tensor overload,
    ``pdf.cu:294-356``): pass an int32 array for ``n_intervals_per_ray``
    together with a *static* ``max_intervals_per_ray`` capacity; outputs are
    batched at the capacity with ``is_valid`` / ``is_left`` / ``is_right``
    masks (the static-shape analogue of the reference's flattened outputs).

    Flat variant (the reference's flat RaySegments overload,
    ``pdf.cu:294-356`` consumed via ``RayIntervals.packed_info``): pass flat
    ``intervals``/``cdfs`` with ``packed_info`` plus a *static*
    ``max_edges_per_ray`` bound on input edges per ray; returns flat
    intervals/samples (every ray resampled to ``n`` intervals), so occ-grid
    (flat) sampling composes with resampling without a manual re-layout.
    """
    if not intervals.is_batched:
        assert intervals.packed_info is not None, (
            "flat importance_sampling needs packed_info"
        )
        assert isinstance(n_intervals_per_ray, int), (
            "flat importance_sampling takes a static int count"
        )
        assert max_edges_per_ray is not None, (
            "flat importance_sampling needs a static max_edges_per_ray"
        )
        starts = intervals.packed_info[:, 0]
        cnts = intervals.packed_info[:, 1]
        n_rays_f = starts.shape[0]
        total = intervals.vals.shape[0]
        j = jnp.arange(int(max_edges_per_ray), dtype=jnp.int32)
        # Pad each ray's edge run by repeating its last edge: the padded
        # cdf region is constant, so no resampled point lands there.
        idx = starts[:, None] + jnp.minimum(
            j[None, :], jnp.maximum(cnts[:, None] - 1, 0)
        )
        idx = jnp.clip(idx, 0, max(total - 1, 0))
        vals_b = jnp.take(intervals.vals, idx.reshape(-1)).reshape(idx.shape)
        cdfs_b = jnp.take(cdfs, idx.reshape(-1)).reshape(idx.shape)
        iv_b, s_b = importance_sampling(
            RayIntervals(vals=vals_b),
            cdfs_b,
            n_intervals_per_ray,
            stratified=stratified,
            key=key,
        )
        n = int(n_intervals_per_ray)
        ray_ok = cnts >= 2  # a ray needs >= 2 edges to define intervals
        edge_rows = jnp.arange(n_rays_f, dtype=jnp.int32)
        iv_flat = RayIntervals(
            vals=iv_b.vals.reshape(-1),
            packed_info=jnp.stack(
                [edge_rows * (n + 1), jnp.full_like(edge_rows, n + 1)], -1
            ),
            ray_indices=jnp.repeat(edge_rows, n + 1),
            is_left=jnp.tile(
                jnp.asarray([True] * n + [False]), n_rays_f
            ) & jnp.repeat(ray_ok, n + 1),
            is_right=jnp.tile(
                jnp.asarray([False] + [True] * n), n_rays_f
            ) & jnp.repeat(ray_ok, n + 1),
        )
        s_flat = RaySamples(
            vals=s_b.vals.reshape(-1),
            packed_info=jnp.stack(
                [edge_rows * n, jnp.full_like(edge_rows, n)], -1
            ),
            ray_indices=jnp.repeat(edge_rows, n),
            is_valid=jnp.repeat(ray_ok, n),
        )
        return iv_flat, s_flat

    vals = intervals.vals  # (n_rays, n_edges)
    n_rays = vals.shape[0]

    per_ray = not isinstance(n_intervals_per_ray, int)
    if per_ray:
        assert max_intervals_per_ray is not None, (
            "per-ray counts need a static max_intervals_per_ray capacity"
        )
        n = int(max_intervals_per_ray)
        n_arr = jnp.asarray(n_intervals_per_ray, vals.dtype)[:, None]
    else:
        n = int(n_intervals_per_ray)
        n_arr = jnp.full((n_rays, 1), float(n), vals.dtype)

    u_floor = cdfs[:, :1]
    u_ceil = cdfs[:, -1:]
    u_step = (u_ceil - u_floor) / n_arr

    if stratified:
        assert key is not None, "stratified sampling requires a PRNG key"
        bias = jax.random.uniform(key, (n_rays, 1), vals.dtype)
    else:
        bias = jnp.full((n_rays, 1), 0.5, vals.dtype)
    sid = jnp.arange(n, dtype=vals.dtype)
    u = u_floor + (sid + bias) * u_step  # (n_rays, n)

    p0, p1 = _searchsorted_clamped(cdfs, u)
    u_lower = jnp.take_along_axis(cdfs, p0, axis=-1)
    u_upper = jnp.take_along_axis(cdfs, p1, axis=-1)
    t_lower = jnp.take_along_axis(vals, p0, axis=-1)
    t_upper = jnp.take_along_axis(vals, p1, axis=-1)

    du = u_upper - u_lower
    # Degenerate CDF span -> midpoint (pdf.cu:157-160).
    t = jnp.where(
        du < 1e-10,
        (t_lower + t_upper) * 0.5,
        (u - u_lower) * (t_upper - t_lower) / jnp.where(du < 1e-10, 1.0, du)
        + t_lower,
    )  # (n_rays, n)

    # Interval edges = midpoints between samples, clamped ends
    # (compute_intervels_kernel, pdf.cu:169-241).
    t_min = vals[:, :1]
    t_max = vals[:, -1:]
    if n >= 2:
        mids = (t[:, 1:] + t[:, :-1]) * 0.5
        first = jnp.maximum(t[:, :1] - (t[:, 1:2] - t[:, :1]) * 0.5, t_min)
        last = jnp.minimum(t[:, -1:] + (t[:, -1:] - t[:, -2:-1]) * 0.5, t_max)
        edges = jnp.concatenate([first, mids, last], axis=-1)
    else:
        edges = jnp.concatenate(
            [jnp.maximum(t, t_min), jnp.minimum(t, t_max)], axis=-1
        )

    if per_ray:
        sid_f = jnp.arange(n, dtype=vals.dtype)
        sample_valid = sid_f[None, :] < n_arr  # (n_rays, n)
        eid_f = jnp.arange(n + 1, dtype=vals.dtype)
        edge_valid = eid_f[None, :] <= n_arr
        # Exact last-edge rule (``compute_intervels_kernel``,
        # ``pdf.cu:230-238``): the count'th edge extrapolates the last valid
        # sample by half its trailing gap, clamped to t_max — NOT the
        # midpoint against the (invalid) capacity-region sample.
        c = jnp.clip(n_arr.astype(jnp.int32), 1, n)  # (n_rays, 1)
        t_last = jnp.take_along_axis(t, c - 1, axis=-1)
        t_prev = jnp.take_along_axis(t, jnp.maximum(c - 2, 0), axis=-1)
        # c == 1 divergence (documented): the reference kernel never writes
        # this edge (OOB read at pdf.cu:211); we use the scalar-n==1 rule.
        last_val = jnp.where(
            c >= 2,
            jnp.minimum(t_last + (t_last - t_prev) * 0.5, t_max),
            jnp.minimum(t_last, t_max),
        )
        rows = jnp.arange(n_rays, dtype=jnp.int32)[:, None]
        edges = edges.at[rows, c].set(last_val)
        is_left = eid_f[None, :] < n_arr
        is_right = (eid_f[None, :] > 0) & edge_valid
        return (
            RayIntervals(vals=edges, is_left=is_left, is_right=is_right),
            RaySamples(vals=t, is_valid=sample_valid),
        )

    return RayIntervals(vals=edges), RaySamples(vals=t)


def _sample_from_weighted(
    bins: Array,
    weights: Array,
    num_samples: int,
    stratified: bool = False,
    vmin: float = -jnp.inf,
    vmax: float = jnp.inf,
    key: Optional[jax.Array] = None,
) -> Tuple[Array, Array]:
    """Pure reference oracle (``nerfacc/pdf.py:134-219``): inverse-CDF
    sampling from a weighted histogram.  Returns ``(edges (..., S+1),
    centers (..., S))``."""
    b = weights.shape[-1]
    s = num_samples
    assert bins.shape[-1] == b + 1
    eps = jnp.finfo(weights.dtype).eps

    pdf = weights / jnp.clip(
        jnp.sum(jnp.abs(weights), axis=-1, keepdims=True), min=eps
    )
    cdf = jnp.concatenate(
        [
            jnp.zeros_like(pdf[..., :1]),
            jnp.cumsum(pdf[..., :-1], axis=-1),
            jnp.ones_like(pdf[..., :1]),
        ],
        axis=-1,
    )

    if not stratified:
        pad = 1 / (2 * s)
        u = jnp.linspace(pad, 1 - pad - eps, s, dtype=bins.dtype)
        u = jnp.broadcast_to(u, bins.shape[:-1] + (s,))
    else:
        assert key is not None
        u_max = eps + (1 - eps) / s
        max_jitter = (1 - u_max) / (s - 1) - eps
        u = jnp.linspace(0, 1 - u_max, s, dtype=bins.dtype) + (
            jax.random.uniform(key, bins.shape[:-1] + (1,), bins.dtype)
            * max_jitter
        )

    n = cdf.shape[-1]
    ceil = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        cdf.reshape(-1, n), u.reshape(-1, s)
    ).reshape(u.shape)
    floor = ceil - 1
    ceil = jnp.clip(ceil, 0, n - 1)
    floor = jnp.clip(floor, 0, n - 1)

    cdf0 = jnp.take_along_axis(cdf, floor, axis=-1)
    cdf1 = jnp.take_along_axis(cdf, ceil, axis=-1)
    b0 = jnp.take_along_axis(bins, floor, axis=-1)
    b1 = jnp.take_along_axis(bins, ceil, axis=-1)

    t = (u - cdf0) / jnp.clip(cdf1 - cdf0, min=eps)
    centers = b0 + t * (b1 - b0)

    samples = (centers[..., 1:] + centers[..., :-1]) / 2
    samples = jnp.concatenate(
        [
            jnp.clip(2 * centers[..., :1] - samples[..., :1], min=vmin),
            samples,
            jnp.clip(2 * centers[..., -1:] - samples[..., -1:], max=vmax),
        ],
        axis=-1,
    )
    return samples, centers
