"""Image render drivers: occupancy-grid and proposal-net pipelines.

Parity target: ``examples/utils.py`` (``render_image_with_occgrid``,
``render_image_with_propnet``).  These are the performance-critical
orchestrators gluing estimator sampling to the radiance field and
``rendering()``.

TPU design (the "ragged economics" answer, SURVEY §7 hard-part 3): traversal
produces a dense ``(n_rays, S)`` grid with per-row valid prefixes; before the
expensive field query, valid samples are **compacted** into a static
``capacity`` budget with sort-free count arithmetic
(:func:`~nerfacc_tpu.pack.compact_indices_from_counts`), so the MLP/hash
encoder runs densely over (mostly) real samples only — the same economics as
the reference's exact CUDA packing, with static shapes.  Everything here is
jit-compatible; the training loop jits one fused step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .estimators.occ_grid import OccGridEstimator, OccGridState
from .estimators.prop_net import PropNetEstimator
from .grid import num_ladder_steps, traverse_and_compact, traverse_grids
from .pack import compact_indices_from_counts
from .volrend import (
    render_visibility_from_density,
    rendering,
)

Array = jnp.ndarray


def gather_ray_od(
    rays_o: Array, rays_d: Array, ray_indices: Array
) -> Tuple[Array, Array]:
    """Per-sample ``(origins, directions)`` via ONE fused ``(n, 6)`` row
    gather.

    ``rays_o[ri]`` + ``rays_d[ri]`` cost two indexed gathers plus two
    lane-layout copies — gathers are priced per *index*, not per row byte
    (round-5 device A/B: one 6-wide gather cut the NGP-occ train step
    38.01 -> 36.08 ms at 16k rays / 2^19 samples).  Use this in field
    callbacks that need both origin and direction per sample.
    """
    g = jnp.take(
        jnp.concatenate([rays_o, rays_d], axis=-1), ray_indices, axis=0
    )
    return g[:, :3], g[:, 3:]


def chunked_ray_components(
    rays_o: Array,
    rays_d: Array,
    ray_indices: Array,
    chunk: int = 4,
) -> Tuple[Tuple[Array, Array, Array], Tuple[Array, Array, Array]]:
    """Per-sample ray origin/direction components for the chunk-aligned
    sorted layout that :func:`~nerfacc_tpu.grid.traverse_and_compact` emits
    (every aligned run of ``chunk`` samples shares one ray).

    Instead of the naive ``rays_o[ray_indices]`` — a per-sample row gather
    materializing a ``(n, 3)`` tensor — this gathers once per *chunk* (4x
    fewer indices) per 1-D component and broadcasts along the chunk axis.
    Returns ``((ox, oy, oz), (dx, dy, dz))`` 1-D ``(n,)`` arrays for field
    callbacks to consume via the SoA field API
    (:meth:`~nerfacc_tpu.models.ngp.NGPRadianceField.query_density`).

    Only valid for chunk-aligned layouts; ``n % chunk != 0`` falls back to
    per-sample gathers (still SoA).

    Measured design note (v5e, 16k rays / 2^19 capacity): in the FULL
    NGP-occ train graph this is a net LOSS (step 77 -> 83 ms vs the naive
    row gather) — XLA fuses ``rays_o[ray_indices]`` + position math into
    the encoder graph well, and the chunk broadcast/reshape breaks that
    fusion (the same failure mode as anchor-cell row broadcast in
    ``hash_soa.py``).  Kept as an opt-in for callbacks that are gather-bound
    in isolation (e.g. density-only probes); the bench uses the array path.
    """
    n = ray_indices.shape[0]
    if n % chunk:
        o = tuple(jnp.take(rays_o[:, k], ray_indices) for k in range(3))
        d = tuple(jnp.take(rays_d[:, k], ray_indices) for k in range(3))
        return o, d
    r_c = ray_indices.reshape(-1, chunk)[:, 0]
    nc = n // chunk

    def comp(col):
        g = jnp.take(col, r_c)  # (n/chunk,)
        return jnp.broadcast_to(g[:, None], (nc, chunk)).reshape(n)

    o = tuple(comp(rays_o[:, k]) for k in range(3))
    d = tuple(comp(rays_d[:, k]) for k in range(3))
    return o, d


def occgrid_render_rays(
    # field callbacks on flat sample tensors
    rgb_sigma_fn: Callable,  # (t_starts, t_ends, ray_indices) -> (rgb, sigma)
    sigma_fn: Optional[Callable],  # same signature -> sigma, for visibility
    estimator: OccGridEstimator,
    state: OccGridState,
    rays_o: Array,
    rays_d: Array,
    *,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    render_step_size: float = 1e-3,
    render_bkgd: Optional[Array] = None,
    cone_angle: float = 0.0,
    alpha_thre: float = 0.0,
    early_stop_eps: float = 1e-4,
    stratified: bool = False,
    key: Optional[jax.Array] = None,
    max_samples_per_ray: Optional[int] = None,
    sample_capacity: Optional[int] = None,
    max_macro_segments: int = 24,
    refilter_capacity: Optional[int] = None,
    rgb_sigma_soa_fn: Optional[Callable] = None,
) -> Tuple[Array, Array, Array, Array, dict]:
    """Render a ray batch with occupancy-grid skipping (jit-compatible).

    Parity: ``examples/utils.py:54-152``.  Returns ``(colors, opacities,
    depths, n_rendering_samples, extras)``; ``n_rendering_samples`` is the
    number of real samples the field was evaluated on (the reference uses it
    for dynamic batch sizing; here it is diagnostic).
    """
    n_rays = rays_o.shape[0]

    # 1. Traverse (no field queries yet).
    near_planes = jnp.full((n_rays,), near_plane, rays_o.dtype)
    far_planes = jnp.full((n_rays,), far_plane, rays_o.dtype)
    if stratified:
        assert key is not None
        key, sub = jax.random.split(key)
        near_planes = near_planes + (
            jax.random.uniform(sub, (n_rays,), rays_o.dtype) * render_step_size
        )
    lattice, use_skip, macro_stride, max_macro, row_cap = (
        estimator.plan_traversal(
            render_step_size,
            cone_angle,
            near_plane,
            max_samples_per_ray=max_samples_per_ray,
            max_macro_segments=max_macro_segments,
            has_skip_grid=state.skip_grid is not None,
        )
    )
    # 2. Fused traversal + compaction straight into the static field budget.
    capacity = sample_capacity or (n_rays * row_cap)
    cs = traverse_and_compact(
        rays_o,
        rays_d,
        state.binaries,
        state.aabbs,
        capacity,
        near_planes=near_planes,
        far_planes=far_planes,
        step_size=render_step_size,
        cone_angle=cone_angle,
        traverse_steps_limit=row_cap,
        max_lattice_steps=lattice,
        skip_grid=state.skip_grid if use_skip else None,
        macro_stride=macro_stride,
        max_macro_segments=max_macro,
        packed_grids=state.binaries_packed,
        packed_skip=state.skip_packed if use_skip else None,
        carry_rays=rgb_sigma_soa_fn is not None,
    )
    soa_comps = None
    if rgb_sigma_soa_fn is not None and cs.ray_comps is not None:
        # SoA fast path: ray components were carried through the compaction
        # sort (no per-sample rays_o/rays_d gather anywhere), and the field
        # consumes 1-D component arrays end-to-end — no (n, 3) tensor (and
        # its 42x TPU lane padding) is ever materialized.  The callback is
        # bound AFTER the optional refilter below so the carried components
        # stay aligned with any re-permuted sample layout.
        soa_comps = cs.ray_comps

    ray_indices = cs.ray_indices
    t_starts = cs.t_starts
    t_ends = cs.t_ends
    kept = cs.kept
    seg_bounds = (cs.seg_starts, cs.seg_counts)

    # 3. Optional visibility filtering by querying the cheap density head
    #    (occ_grid.py:180-220 semantics, on the compacted layout).
    #    With alpha_thre == 0 the filter only drops samples whose
    #    transmittance is already < eps — numerically inert in the density
    #    path — so the extra field pass is skipped (the reference pays it
    #    because its packed layout shrinks; ours doesn't).
    if sigma_fn is not None and (alpha_thre > 0.0 or refilter_capacity):
        sigmas = jax.lax.stop_gradient(sigma_fn(t_starts, t_ends, ray_indices))
        sigmas = jnp.where(kept, sigmas, 0.0)
        alpha_thre_t = jnp.minimum(alpha_thre, jnp.mean(state.occs))
        masks = render_visibility_from_density(
            t_starts=t_starts,
            t_ends=t_ends,
            sigmas=sigmas,
            ray_indices=ray_indices,
            early_stop_eps=early_stop_eps,
            alpha_thre=alpha_thre_t,
        )
        kept = kept & masks
        t_ends = jnp.where(kept, t_ends, t_starts)

        if refilter_capacity:
            # Second-phase compaction: shrink the differentiable pass to the
            # surviving samples (the reference's packed-shrink economics,
            # occ_grid.py:214-220, under static shapes).  Survivor rank
            # within each ray comes from a flat segmented cumsum; one scatter
            # of source positions inverts the map.
            from .scan import flags_from_ray_indices, seg_inclusive_sum

            flags = flags_from_ray_indices(ray_indices)
            rank = seg_inclusive_sum(kept.astype(jnp.int32), flags)
            counts2 = jax.ops.segment_sum(
                kept.astype(jnp.int32), ray_indices, num_segments=n_rays
            )
            cum2 = jnp.cumsum(counts2) - counts2
            total2 = cum2[-1] + counts2[-1]
            slot2 = jnp.where(
                kept, jnp.take(cum2, ray_indices) + rank - 1, refilter_capacity
            )
            src = (
                jnp.zeros((refilter_capacity,), jnp.int32)
                .at[slot2]
                .set(jnp.arange(kept.shape[0], dtype=jnp.int32), mode="drop")
            )
            ray_indices = jnp.take(ray_indices, src)
            t_starts = jnp.take(t_starts, src)
            t_ends = jnp.take(t_ends, src)
            if soa_comps is not None:
                # Keep the carried SoA ray components aligned with the
                # re-permuted sample layout (same source map).
                o_c, d_c = soa_comps
                soa_comps = (
                    tuple(jnp.take(c, src) for c in o_c),
                    tuple(jnp.take(c, src) for c in d_c),
                )
            kept = jnp.arange(refilter_capacity, dtype=jnp.int32) < total2
            t_ends = jnp.where(kept, t_ends, t_starts)
            # Re-compacted layout: per-ray slot ranges shifted; the padding
            # tail also decodes to ray 0 here, breaking sortedness.
            seg_bounds = None

    if soa_comps is not None:
        o_comps, d_comps = soa_comps

        def rgb_sigma_fn(ts, te, ri):  # noqa: F811 — deliberate shadow
            return rgb_sigma_soa_fn(o_comps, d_comps, ts, te)

    # 4. Differentiable rendering on the compacted flat layout.
    colors, opacities, depths, extras = rendering(
        t_starts,
        t_ends,
        ray_indices=ray_indices,
        n_rays=n_rays,
        rgb_sigma_fn=rgb_sigma_fn,
        render_bkgd=render_bkgd,
        is_valid=kept,
        seg_bounds=seg_bounds,
    )
    n_rendering_samples = jnp.sum(kept.astype(jnp.int32))
    extras = dict(extras)
    extras["kept"] = kept
    extras["ray_indices"] = ray_indices
    # Fraction of rays whose tail samples were dropped by the macro-segment
    # budget (silent quality loss if it stays high — raise
    # max_macro_segments; the CLIs auto-escalate on this signal).
    extras["macro_truncated_frac"] = jnp.mean(
        cs.macro_truncated.astype(jnp.float32)
    )
    return colors, opacities, depths, n_rendering_samples, extras


def occgrid_render_rays_test(
    rgb_sigma_fn_builder: Callable,  # params-free: (rays_o, rays_d) -> fn
    estimator: OccGridEstimator,
    state: OccGridState,
    rays_o: Array,
    rays_d: Array,
    *,
    max_samples: int = 1024,
    samples_per_round: int = 32,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    render_step_size: float = 1e-3,
    render_bkgd: Optional[Array] = None,
    cone_angle: float = 0.0,
    alpha_thre: float = 0.0,
    early_stop_eps: float = 1e-4,
    lattice_per_round: Optional[int] = None,
    capacity_buckets: int = 3,
) -> Tuple[Array, Array, Array, int]:
    """Iterative alive-ray inference renderer (Instant-NGP style).

    Parity: ``examples/utils.py:253-425`` — bounded per-round work with
    carried ``prefix_trans`` (as accumulated opacity), termination-plane
    near advance, and early stop at opacity > 1-eps.

    TPU shape design: each round is one jitted function with static shapes —
    windowed traversal (``samples_per_round`` per ray over a bounded lattice
    window), count-based compaction, field on the compacted batch.  The host
    loop reads the alive count and picks a compaction-capacity bucket
    (powers of two), so work per round shrinks with the alive set in ~log
    many compiled variants instead of dynamic shapes.

    Returns ``(rgb (n,3), opacity (n,1), depth (n,1), total_samples)``.
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype

    full_lattice = num_ladder_steps(
        estimator.max_t_range, render_step_size, cone_angle, near=near_plane
    )
    window = lattice_per_round or min(full_lattice, samples_per_round * 8)

    @partial(jax.jit, static_argnames=("capacity",))
    def round_fn(near_planes, alive, rgb, opacity, depth, capacity: int):
        res = traverse_grids(
            rays_o,
            rays_d,
            state.binaries,
            state.aabbs,
            near_planes=near_planes,
            far_planes=jnp.full((n_rays,), far_plane, dtype),
            step_size=render_step_size,
            cone_angle=cone_angle,
            traverse_steps_limit=samples_per_round,
            rays_mask=alive,
            max_lattice_steps=window,
            packed_grids=state.binaries_packed,
        )
        gather_idx, ray_indices, kept = compact_indices_from_counts(
            res.num_valid, samples_per_round, capacity
        )
        t_starts = res.t_starts.reshape(-1)[gather_idx]
        t_ends = res.t_ends.reshape(-1)[gather_idx]
        t_ends = jnp.where(kept, t_ends, t_starts)

        rgbs, sigmas = rgb_sigma_fn_builder(rays_o, rays_d)(
            t_starts, t_ends, ray_indices
        )
        sigmas = jnp.where(kept, sigmas, 0.0)
        from .volrend import render_weight_from_density

        weights, _, alphas = render_weight_from_density(
            t_starts,
            t_ends,
            sigmas,
            ray_indices=ray_indices,
            n_rays=n_rays,
            prefix_trans=1.0 - opacity[ray_indices, 0],
        )
        if alpha_thre > 0:
            weights = jnp.where(alphas >= alpha_thre, weights, 0.0)

        rgb = rgb + jax.ops.segment_sum(
            weights[:, None] * rgbs, ray_indices, num_segments=n_rays
        )
        opacity = opacity + jax.ops.segment_sum(
            weights[:, None], ray_indices, num_segments=n_rays
        )
        depth = depth + jax.ops.segment_sum(
            (weights * (t_starts + t_ends) / 2.0)[:, None],
            ray_indices,
            num_segments=n_rays,
        )
        near_planes = res.termination_planes
        alive = (
            alive
            & (opacity[:, 0] <= 1.0 - early_stop_eps)
            & (near_planes < res.far_effective - 1e-6)
        )
        n_round_samples = jnp.sum(kept.astype(jnp.int32))
        return near_planes, alive, rgb, opacity, depth, n_round_samples

    near_planes = jnp.full((n_rays,), near_plane, dtype)
    alive = jnp.ones((n_rays,), bool)
    rgb = jnp.zeros((n_rays, 3), dtype)
    opacity = jnp.zeros((n_rays, 1), dtype)
    depth = jnp.zeros((n_rays, 1), dtype)

    total_samples = 0
    iter_samples = 0
    max_capacity = n_rays * samples_per_round
    # Fixed geometric bucket ladder (ratio 4): at most `capacity_buckets`
    # compiled variants of round_fn, ever.  An unbounded pow2 ladder would
    # compile up to log2(n_rays * S) variants — at minutes per remote TPU
    # compile that puts first-render latency in the tens of minutes.
    buckets = sorted(
        max(max_capacity >> (2 * i), samples_per_round)
        for i in range(max(1, capacity_buckets))
    )
    while iter_samples < max_samples:
        n_alive = int(jnp.sum(alive.astype(jnp.int32)))
        if n_alive == 0:
            break
        # Smallest bucket covering the alive set's worst case.
        want = min(n_alive * samples_per_round, max_capacity)
        capacity = next(b for b in buckets if b >= want)
        near_planes, alive, rgb, opacity, depth, n_s = round_fn(
            near_planes, alive, rgb, opacity, depth, capacity=capacity
        )
        total_samples += int(n_s)
        iter_samples += samples_per_round

    if render_bkgd is not None:
        rgb = rgb + render_bkgd * (1.0 - opacity)
    depth = depth / jnp.clip(opacity, min=jnp.finfo(dtype).eps)
    return rgb, opacity, depth, total_samples


def propnet_render_rays(
    rgb_sigma_fn: Callable,  # batched (t_starts, t_ends) -> (rgb, sigma)
    prop_sigma_fns: Sequence[Callable],
    estimator: PropNetEstimator,
    rays_o: Array,
    rays_d: Array,
    *,
    num_samples: int = 48,
    prop_samples: Sequence[int] = (256, 96),
    near_plane: float = 0.2,
    far_plane: float = 1e3,
    sampling_type: str = "lindisp",
    opaque_bkgd: bool = True,
    render_bkgd: Optional[Array] = None,
    stratified: bool = False,
    requires_grad: bool = False,
    key: Optional[jax.Array] = None,
):
    """Render a ray batch via proposal-network resampling (jit-compatible).

    Parity: ``examples/utils.py:155-249``.  Returns ``(colors, opacities,
    depths, extras)``; ``extras['prop_cache']`` and ``extras['trans']`` feed
    :meth:`PropNetEstimator.compute_loss`.
    """
    n_rays = rays_o.shape[0]
    t_starts, t_ends, cache = estimator.sampling(
        prop_sigma_fns=prop_sigma_fns,
        prop_samples=list(prop_samples),
        num_samples=num_samples,
        n_rays=n_rays,
        near_plane=near_plane,
        far_plane=far_plane,
        sampling_type=sampling_type,
        stratified=stratified,
        requires_grad=requires_grad,
        key=key,
    )

    def _rgb_sigma_fn(ts, te, ray_indices):
        del ray_indices
        rgb, sigma = rgb_sigma_fn(ts, te)
        if opaque_bkgd:
            # Make the last interval opaque (examples/utils.py propnet path).
            sigma = sigma.at[..., -1].set(jnp.inf)
        return rgb, sigma

    colors, opacities, depths, extras = rendering(
        t_starts,
        t_ends,
        rgb_sigma_fn=_rgb_sigma_fn,
        render_bkgd=render_bkgd,
    )
    extras = dict(extras)
    extras["prop_cache"] = cache
    extras["t_starts"] = t_starts
    extras["t_ends"] = t_ends
    return colors, opacities, depths, extras
