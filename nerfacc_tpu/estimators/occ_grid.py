"""Occupancy-grid transmittance estimator (Instant-NGP style spatial skipping).

Parity target: ``nerfacc/estimators/occ_grid.py`` — multi-level 2x-nested
binary grids, EMA-max occupancy updates, frustum-visibility marking, and
``sampling()`` with optional density-based visibility filtering.

TPU design:
- Estimator state (``occs``, ``binaries``, ``aabbs``) is an immutable pytree
  (:class:`OccGridState`); all methods are pure and jittable.
- ``sampling()`` returns *static-capacity* flat arrays ``(ray_indices,
  t_starts, t_ends, is_valid)`` instead of exact-size tensors; invalid slots
  carry ``t_start == t_end`` and are exact no-ops downstream.
- RNG uses explicit ``jax.random`` keys instead of CUDA Philox
  (``occ_grid.py:162-163`` stratified jitter, ``:385-392`` cell jitter).
- The EMA update uses scatter-max (associative), which also makes the
  multi-chip merge a plain element-wise ``max`` collective (SURVEY §5.8).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..grid import (
    _enlarge_aabb,
    build_skip_grid,
    num_ladder_steps,
    traverse_and_compact,
)
from ..ops.occ_query import bitpack_grid
from ..volrend import (
    render_visibility_from_alpha,
    render_visibility_from_density,
)
from .base import AbstractEstimator

Array = jnp.ndarray


@struct.dataclass
class OccGridState:
    """Pytree state of :class:`OccGridEstimator`.

    ``occs`` holds per-cell EMA occupancy (``-1`` marks camera-invisible
    cells); ``binaries`` the thresholded boolean grid per level.
    """

    aabbs: Array  # (levels, 6)
    occs: Array  # (levels * cells_per_lvl,)
    binaries: Array  # (levels, rx, ry, rz) bool
    skip_grid: Optional[Array] = None  # (levels, rx/f, ...) dilated macro occupancy
    # Bit-packed copies (u32 words along z) feeding the Pallas VMEM query
    # kernel on TPU; rebuilt whenever the binary grids change.
    binaries_packed: Optional[Array] = None  # (levels, rx, ry*ceil32(rz)/32)
    skip_packed: Optional[Array] = None


class OccGridEstimator(AbstractEstimator):
    """Occupancy grid estimator; parity with ``occ_grid.py:14-83``.

    Args:
        roi_aabb: region-of-interest box, 6 floats.
        resolution: grid resolution (int or 3 ints). Default 128.
        levels: number of 2x-nested levels. Default 1.
    """

    DIM: int = 3

    def __init__(
        self,
        roi_aabb: Union[Sequence[float], np.ndarray],
        resolution: Union[int, Sequence[int]] = 128,
        levels: int = 1,
        skip_factor: int = 2,
    ) -> None:
        if isinstance(resolution, int):
            resolution = [resolution] * self.DIM
        resolution = tuple(int(r) for r in resolution)
        assert len(resolution) == self.DIM
        # Largest factor <= requested that divides every axis (1 always
        # does) — build_skip_grid requires exact divisibility.
        requested_skip = max(1, int(skip_factor))
        skip_factor = requested_skip
        while any(r % skip_factor for r in resolution):
            skip_factor -= 1
        if skip_factor != requested_skip:
            import warnings

            warnings.warn(
                f"skip_factor={requested_skip} does not divide resolution "
                f"{resolution}; lowered to {skip_factor}"
                + (
                    " (macro-skip degraded to a full-resolution coarse grid"
                    " — expect slower traversal)"
                    if skip_factor == 1
                    else ""
                ),
                stacklevel=2,
            )
        self.skip_factor = skip_factor
        roi_aabb = np.asarray(roi_aabb, dtype=np.float32)
        assert roi_aabb.shape[0] == self.DIM * 2

        self.resolution = resolution
        self.levels = int(levels)
        self.cells_per_lvl = int(np.prod(resolution))
        self.roi_aabb = roi_aabb
        # Multi-level 2x-enlarged AABBs (static numpy; occ_grid.py:57-60).
        self._aabbs_np = np.stack(
            [np.asarray(_enlarge_aabb(roi_aabb, 2**i)) for i in range(levels)]
        )
        # Static scene extent for sizing the traversal lattice.
        outer = self._aabbs_np[-1]
        self.max_t_range = float(np.linalg.norm(outer[3:] - outer[:3]))

        # Cell-center integer coords, shared across levels (occ_grid.py:76-83).
        gx, gy, gz = np.meshgrid(
            np.arange(resolution[0]),
            np.arange(resolution[1]),
            np.arange(resolution[2]),
            indexing="ij",
        )
        self._grid_coords_np = np.stack([gx, gy, gz], axis=-1).reshape(
            self.cells_per_lvl, self.DIM
        ).astype(np.float32)

    # ------------------------------------------------------------------
    def init(self) -> OccGridState:
        binaries = jnp.zeros((self.levels,) + self.resolution, bool)
        skip_grid = build_skip_grid(binaries, self.skip_factor)
        return OccGridState(
            aabbs=jnp.asarray(self._aabbs_np),
            occs=jnp.zeros((self.levels * self.cells_per_lvl,), jnp.float32),
            binaries=binaries,
            skip_grid=skip_grid,
            binaries_packed=jax.vmap(bitpack_grid)(binaries),
            skip_packed=jax.vmap(bitpack_grid)(skip_grid),
        )

    def set_binaries(self, state: OccGridState, binaries: Array) -> OccGridState:
        """Replace the binary grid and rebuild the derived skip grid.

        Use this instead of ``state.replace(binaries=...)`` — a stale
        ``skip_grid`` silently prunes everything in the macro-skip traversal.
        """
        skip_grid = build_skip_grid(binaries, self.skip_factor)
        return state.replace(
            binaries=binaries,
            skip_grid=skip_grid,
            binaries_packed=jax.vmap(bitpack_grid)(binaries),
            skip_packed=jax.vmap(bitpack_grid)(skip_grid),
        )

    # ------------------------------------------------------------------
    def plan_traversal(
        self,
        render_step_size: float,
        cone_angle: float = 0.0,
        near_plane: float = 0.0,
        max_samples_per_ray: Optional[int] = None,
        max_macro_segments: int = 24,
        has_skip_grid: bool = True,
    ):
        """Static traversal-shape plan shared by every sampling entry point.

        Returns ``(lattice, use_skip, macro_stride, max_macro, row_cap)``.
        For the uniform ladder ``macro_stride`` keeps each macro span under
        2 skip-cells so the dilation-1 midpoint query stays conservative
        (see :func:`~nerfacc_tpu.grid.build_skip_grid`); the geometric
        (cone) ladder uses a fixed stride of 16 — there segment span and
        mip cell size both grow ~ t, and the traversal probes 4 points per
        segment to stay conservative.  That 4-probe test is only
        conservative while the quarter-segment span (~4*cone*t) stays under
        the dilated skip-cell size (~2*skip_factor*t/res), so for
        ``cone_angle > skip_factor / (2*res)`` macro-skip is disabled
        (falling back to the dense lattice) rather than risk pruning
        occupied segments.
        """
        lattice = num_ladder_steps(
            self.max_t_range, render_step_size, cone_angle, near=near_plane
        )
        use_skip = has_skip_grid
        if cone_angle > self.skip_factor / (2.0 * max(self.resolution)):
            use_skip = False
        if use_skip and cone_angle <= 0.0:
            cell0 = float(
                (self.roi_aabb[3] - self.roi_aabb[0]) / self.resolution[0]
            )
            macro_stride = int(
                2 * self.skip_factor * cell0 / render_step_size
            )
            macro_stride = max(4, min(64, macro_stride))
            max_macro = min(max_macro_segments, -(-lattice // macro_stride))
            row_cap = max_samples_per_ray or (max_macro * macro_stride)
            row_cap = min(row_cap, max_macro * macro_stride)
        elif use_skip:
            macro_stride = 16
            max_macro = min(max_macro_segments, -(-lattice // macro_stride))
            row_cap = max_samples_per_ray or (max_macro * macro_stride)
            row_cap = min(row_cap, max_macro * macro_stride)
        else:
            macro_stride = 16
            max_macro = 16
            row_cap = max_samples_per_ray or lattice
        return lattice, use_skip, macro_stride, max_macro, row_cap

    # ------------------------------------------------------------------
    def sampling(
        self,
        state: OccGridState,
        rays_o: Array,
        rays_d: Array,
        sigma_fn: Optional[Callable] = None,
        alpha_fn: Optional[Callable] = None,
        near_plane: float = 0.0,
        far_plane: float = 1e10,
        t_min: Optional[Array] = None,
        t_max: Optional[Array] = None,
        render_step_size: float = 1e-3,
        early_stop_eps: float = 1e-4,
        alpha_thre: float = 0.0,
        stratified: bool = False,
        cone_angle: float = 0.0,
        key: Optional[jax.Array] = None,
        max_samples: Optional[int] = None,
        sample_capacity: Optional[int] = None,
        max_macro_segments: int = 24,
        use_macro_skip: bool = True,
        return_extras: bool = False,
    ) -> Tuple[Array, ...]:
        """Sample along rays with empty-space skipping.

        Parity: ``occ_grid.py:85-221``.  Returns flat static-capacity arrays
        ``(ray_indices, t_starts, t_ends, is_valid)``, globally compacted and
        sorted by ray.  The flat length is ``sample_capacity`` if given, else
        ``n_rays * row_cap`` where ``row_cap`` is the per-ray sample budget
        (``max_samples`` == the reference's ``traverse_steps_limit``).

        This IS the fast path: macro-skip traversal fused with compaction
        (:func:`~nerfacc_tpu.grid.traverse_and_compact`) — identical to what
        the train driver :func:`~nerfacc_tpu.rendering.occgrid_render_rays`
        runs, so composing via this public API costs the same as the driver.

        TRUNCATION CAVEAT: with macro-skip on, rays crossing more than
        ``max_macro_segments`` occupied macro segments lose their tail
        samples (the reference's traverse_steps_limit contract never
        truncates this way).  Dense scenes need a larger budget (a solid
        ball needs ~24; the default).  Tune ``max_macro_segments`` per
        scene — or set ``use_macro_skip=False`` to traverse the dense
        lattice.  Pass ``return_extras=True`` to get a fifth element: an
        extras dict with ``macro_truncated`` (per-ray bool) and
        ``macro_truncated_frac`` (scalar) — the same signal the train
        driver :func:`~nerfacc_tpu.rendering.occgrid_render_rays` reports
        in ``extras['macro_truncated_frac']`` and the CLIs auto-escalate
        on.

        Not differentiable (wrap calls in ``stop_gradient`` contexts).
        """
        n_rays = rays_o.shape[0]
        near_planes = jnp.full((n_rays,), near_plane, rays_o.dtype)
        far_planes = jnp.full((n_rays,), far_plane, rays_o.dtype)
        if t_min is not None:
            near_planes = jnp.maximum(near_planes, t_min)
        if t_max is not None:
            far_planes = jnp.minimum(far_planes, t_max)
        if stratified:
            assert key is not None, "stratified sampling requires a PRNG key"
            near_planes = near_planes + (
                jax.random.uniform(key, (n_rays,), rays_o.dtype)
                * render_step_size
            )

        lattice, use_skip, macro_stride, max_macro, row_cap = (
            self.plan_traversal(
                render_step_size,
                cone_angle,
                near_plane,
                max_samples_per_ray=max_samples,
                max_macro_segments=max_macro_segments,
                has_skip_grid=use_macro_skip
                and state.skip_grid is not None,
            )
        )
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
            base_aabb=state.aabbs[0],
            skip_grid=state.skip_grid if use_skip else None,
            macro_stride=macro_stride,
            max_macro_segments=max_macro,
            packed_grids=state.binaries_packed,
            packed_skip=state.skip_packed if use_skip else None,
        )
        t_starts = cs.t_starts
        t_ends = cs.t_ends
        is_valid = cs.kept
        ray_indices = cs.ray_indices

        # Visibility filtering by querying the user's field (occ_grid.py:180-220).
        if (alpha_thre > 0.0 or early_stop_eps > 0.0) and (
            sigma_fn is not None or alpha_fn is not None
        ):
            alpha_thre_t = jnp.minimum(alpha_thre, jnp.mean(state.occs))
            if sigma_fn is not None:
                sigmas = sigma_fn(t_starts, t_ends, ray_indices)
                sigmas = jnp.where(is_valid, sigmas, 0.0)
                masks = render_visibility_from_density(
                    t_starts=t_starts,
                    t_ends=t_ends,
                    sigmas=sigmas,
                    ray_indices=ray_indices,
                    early_stop_eps=early_stop_eps,
                    alpha_thre=alpha_thre_t,
                )
            else:
                alphas = alpha_fn(t_starts, t_ends, ray_indices)
                alphas = jnp.where(is_valid, alphas, 0.0)
                masks = render_visibility_from_alpha(
                    alphas=alphas,
                    ray_indices=ray_indices,
                    early_stop_eps=early_stop_eps,
                    alpha_thre=alpha_thre_t,
                )
            # Drop invisible samples: collapse their interval (dt -> 0).
            is_valid = is_valid & masks
            t_ends = jnp.where(is_valid, t_ends, t_starts)

        t_starts = jax.lax.stop_gradient(t_starts)
        t_ends = jax.lax.stop_gradient(t_ends)
        if return_extras:
            extras = {
                "macro_truncated": cs.macro_truncated,
                "macro_truncated_frac": jnp.mean(
                    cs.macro_truncated.astype(jnp.float32)
                ),
            }
            return ray_indices, t_starts, t_ends, is_valid, extras
        return ray_indices, t_starts, t_ends, is_valid

    # ------------------------------------------------------------------
    def update_every_n_steps(
        self,
        state: OccGridState,
        step: int,
        occ_eval_fn: Callable,
        key: jax.Array,
        occ_thre: float = 1e-2,
        ema_decay: float = 0.95,
        warmup_steps: int = 256,
        n: int = 16,
        soa_positions: Optional[bool] = None,
    ) -> OccGridState:
        """EMA update the grid every ``n`` steps (``occ_grid.py:223-259``).

        ``step`` is a host-side python int (the train loop owns the schedule),
        so the every-n check costs nothing under jit.
        """
        if step % n == 0:
            return self._update(
                state,
                step=step,
                occ_eval_fn=occ_eval_fn,
                key=key,
                occ_thre=occ_thre,
                ema_decay=ema_decay,
                warmup_steps=warmup_steps,
                soa_positions=soa_positions,
            )
        return state

    def _update(
        self,
        state: OccGridState,
        step: int,
        occ_eval_fn: Callable,
        key: jax.Array,
        occ_thre: float = 1e-2,
        ema_decay: float = 0.95,
        warmup_steps: int = 256,
        soa_positions: Optional[bool] = None,
    ) -> OccGridState:
        """One EMA update (``occ_grid.py:366-404``).

        ``soa_positions=True`` hands ``occ_eval_fn`` a ``(xs, ys, zs)``
        component tuple instead of an ``(n, 3)`` array (no lane-padded
        3-minor intermediates; the fn must accept tuples — true for
        ``NGPRadianceField.query_density`` with the fused/grouped
        encoders).  Default ``None`` reads NERFACC_OCC_SOA (off).

        Warmup (step < warmup_steps): evaluate every cell of every level.
        After: per level, 1/4-of-cells uniform + 1/4 occupancy-weighted cells
        (reference: uniform over occupied; here a categorical over the binary
        mask — uniform over occupied cells, uniform over all if none occupied).
        """
        resolution = jnp.asarray(self.resolution, jnp.float32)
        occs = state.occs

        if step < warmup_steps:
            lvl_indices = [
                jnp.arange(self.cells_per_lvl, dtype=jnp.int32)
                for _ in range(self.levels)
            ]
        else:
            n_cells = self.cells_per_lvl // 4
            lvl_indices = []
            for lvl in range(self.levels):
                key, k_uni, k_occ = jax.random.split(key, 3)
                uniform_idx = jax.random.randint(
                    k_uni, (n_cells,), 0, self.cells_per_lvl, jnp.int32
                )
                # Uniform over *occupied* cells (the reference's sampling,
                # occ_grid.py:372-379): compact the occupied cell ids, then
                # draw uniform ranks.  O(cells + n) with ~n/20 the indexed
                # ops of a searchsorted inverse-CDF (binary search costs
                # log(cells) gathers per draw — ~77 ms at res-128 on v5e),
                # and none of jax.random.categorical's (n, cells) Gumbel
                # blowup.
                occ_mask = state.binaries[lvl].reshape(-1)
                total = jnp.sum(occ_mask.astype(jnp.int32))
                cell_arange = jnp.arange(self.cells_per_lvl, dtype=jnp.int32)
                if os.environ.get("NERFACC_OCC_COMPACT", "sort") == "sort":
                    # One single-operand sort: occupied ids keep their value,
                    # empty cells get id + cells (all larger), so ascending
                    # order lands the occupied ids in the first `total`
                    # slots.  Replaces a cells-wide cumsum + rank scatter —
                    # XLA's TPU scatter is serial per index while its sort
                    # is parallel (same physics as the compaction and
                    # table-gradient wins).
                    # Unstable: the keys are all distinct, so the stability
                    # iota (a second carried operand JAX adds silently)
                    # buys nothing — round-5 occ trace: sort.8 = 2.5 ms of
                    # the update was 2-operand for a 1-array sort.
                    occupied_cells = jax.lax.sort(
                        (jnp.where(
                            occ_mask,
                            cell_arange,
                            self.cells_per_lvl + cell_arange,
                        ),),
                        num_keys=1,
                        is_stable=False,
                    )[0]
                else:
                    cdf = jnp.cumsum(occ_mask.astype(jnp.int32))
                    occupied_cells = (
                        jnp.zeros((self.cells_per_lvl,), jnp.int32)
                        .at[
                            jnp.where(
                                occ_mask,
                                cdf - 1,
                                # distinct OOB slots -> provably unique index
                                # vector (permutation-write scatter lowering)
                                self.cells_per_lvl + cell_arange,
                            )
                        ]
                        .set(cell_arange, mode="drop", unique_indices=True)
                    )
                draw_mode = os.environ.get("NERFACC_OCC_DRAW", "sysrow")
                if draw_mode == "sysrow":
                    # Row-granular systematic draw: gather 128-wide ROWS of
                    # the sorted occupied list instead of n scalar elements.
                    # A 1-D scalar gather costs ~7 ns per 4 B transaction
                    # (3.74 ms for 512k draws in the round-5 occ trace);
                    # 4k row gathers move the same volume in ~0.03 ms.  The
                    # draw becomes block-stratified — each drawn row is 128
                    # consecutive ranks of the sorted occupied list — but
                    # marginally each occupied cell is still drawn with
                    # probability ~n/total per update (row ranks stride the
                    # whole list from one random offset), and every probe
                    # keeps its own intra-cell jitter, so duplicate draws
                    # when total < n remain useful max-refresh probes.
                    ROWW = 128
                    n_rows_draw = n_cells // ROWW
                    total_rows = jnp.maximum(
                        (total + ROWW - 1) // ROWW, 1
                    )
                    off = jax.random.uniform(k_occ, ())
                    q = (
                        (jnp.arange(n_rows_draw, dtype=jnp.float32) + off)
                        * (total_rows.astype(jnp.float32) / n_rows_draw)
                    ).astype(jnp.int32)
                    q = jnp.minimum(q, total_rows - 1)
                    rows = jnp.take(
                        occupied_cells.reshape(-1, ROWW),
                        q,
                        axis=0,
                        indices_are_sorted=True,
                    )
                    drawn = rows.reshape(-1)
                    # The last occupied row can hold empty-cell sentinels
                    # (encoded id + cells, sorted past every occupied id):
                    # decode them back to their own (empty) cell — probing
                    # an empty cell is exactly what the uniform half does.
                    drawn = jnp.where(
                        drawn < self.cells_per_lvl,
                        drawn,
                        drawn - self.cells_per_lvl,
                    )
                    occupied_idx = jnp.where(
                        total > 0, drawn, uniform_idx
                    )
                    lvl_indices.append(
                        jnp.concatenate([uniform_idx, occupied_idx])
                    )
                    continue
                if draw_mode == "sys":
                    # Systematic draw: ranks at a fixed fractional stride
                    # from one random offset.  Marginally each occupied
                    # cell is still drawn with probability n/total, and
                    # the SORTED occupied list makes the ranks ascending —
                    # a monotone gather instead of 512k random 4 B
                    # transactions (7.1 ns each, 3.7 ms of the round-4
                    # occ-update trace).  Spatially it stratifies the
                    # draw, which only helps an EMA refresh.
                    off = jax.random.uniform(k_occ, ())
                    u = (
                        (jnp.arange(n_cells, dtype=jnp.float32) + off)
                        * (jnp.maximum(total, 1).astype(jnp.float32)
                           / n_cells)
                    ).astype(jnp.int32)
                    # f32 rank rounding can land exactly on `total` for
                    # large occupied counts (abs error ~0.25 near 2^21),
                    # which would read an unset occupied_cells slot.
                    u = jnp.minimum(u, jnp.maximum(total, 1) - 1)
                    take_kw = dict(indices_are_sorted=True)
                else:
                    u = jax.random.randint(
                        k_occ, (n_cells,), 0, jnp.maximum(total, 1),
                        jnp.int32,
                    )
                    take_kw = {}
                # Nothing occupied yet -> harmless uniform-over-all fallback.
                occupied_idx = jnp.where(
                    total > 0,
                    jnp.take(occupied_cells, u, **take_kw),
                    uniform_idx,
                )
                lvl_indices.append(
                    jnp.concatenate([uniform_idx, occupied_idx])
                )

        ry, rz = self.resolution[1], self.resolution[2]
        for lvl, indices in enumerate(lvl_indices):
            key, k_jit = jax.random.split(key)
            # Cell coords derived arithmetically from the flat index
            # (meshgrid-ij layout) — replaces a row gather of the
            # (cells, 3) coord table (~7 ns/index for 1M sampled cells).
            comps = [
                (indices // (ry * rz)).astype(jnp.float32),
                ((indices // rz) % ry).astype(jnp.float32),
                (indices % rz).astype(jnp.float32),
            ]
            aabb = state.aabbs[lvl]
            use_soa = (
                os.environ.get("NERFACC_OCC_SOA", "0") == "1"
                if soa_positions is None
                else soa_positions
            )
            if use_soa:
                # SoA probe positions: three 1-D component arrays instead
                # of one (n, 3) tensor (whose 3-minor dim lane-pads 42x on
                # TPU — the round-4 occ trace's copy.9 3.15 ms +
                # reshape.23 2.09 ms are exactly such relayouts).  The
                # eval fn must accept a component tuple — true for
                # NGPRadianceField.query_density with the fused/grouped
                # encoders; keep the default (n, 3) path for generic fns.
                x = tuple(
                    aabb[c]
                    + (
                        comps[c]
                        + jax.random.uniform(
                            jax.random.fold_in(k_jit, c),
                            comps[c].shape, jnp.float32,
                        )
                    )
                    / resolution[c]
                    * (aabb[3 + c] - aabb[c])
                    for c in range(3)
                )
            else:
                coords = jnp.stack(comps, axis=-1)
                x = (
                    coords
                    + jax.random.uniform(k_jit, coords.shape, jnp.float32)
                ) / resolution
                x = aabb[:3] + x * (aabb[3:] - aabb[:3])
            occ = occ_eval_fn(x).reshape(-1)

            cell_ids = lvl * self.cells_per_lvl + indices
            # EMA reduction (associative; dedups repeated indices).  The
            # -1 fill doubles as the touched mask (occ_eval_fn outputs are
            # non-negative — densities*step or alphas, as in the reference)
            # so one pass serves both roles.  NERFACC_OCC_EMA selects the
            # implementation: "sortmax" replaces the XLA scatter-max
            # (7.0 ms at 1M indices, round-4 occ trace) with sort +
            # segmented-max + the windowed one-hot MXU placement kernel
            # (ops/table_grad.cell_max_sorted).  MEASURED MIXED on device:
            # -1.4 ms at the bench scale (res-128 grid, 1M draws) but
            # ~+0.6 s per update at the quality scale (res-64, 131k draws
            # — t_400 40.6 vs 25.4 s).  The default "auto" therefore
            # selects by DRAW COUNT: sortmax for >= 2^19 draws (where the
            # sort amortizes), scatter below (round-5 closes the VERDICT
            # item on the scale-sensitive env knob).
            n_total = int(occs.shape[0])
            ema_impl = os.environ.get("NERFACC_OCC_EMA", "auto")
            if ema_impl == "auto":
                ema_impl = (
                    "sortmax"
                    if int(indices.shape[0]) >= (1 << 19)
                    else "scatter"
                )
            if ema_impl == "sortmax" and n_total % 32768 == 0:
                from ..ops.table_grad import cell_max_sorted, on_tpu

                proposed = cell_max_sorted(
                    cell_ids, occ.astype(jnp.float32),
                    n_cells=n_total, interpret=not on_tpu(),
                )
            else:
                proposed = jnp.full_like(occs, -1.0).at[cell_ids].max(occ)
            touched = proposed >= 0.0
            proposed = jnp.maximum(proposed, 0.0)
            # Never resurrect camera-invisible cells (marked -1).
            touched = touched & (occs >= 0.0)
            occs = jnp.where(
                touched, jnp.maximum(occs * ema_decay, proposed), occs
            )

        visible = occs >= 0.0
        mean_occ = jnp.sum(jnp.where(visible, occs, 0.0)) / jnp.maximum(
            jnp.sum(visible.astype(jnp.float32)), 1.0
        )
        thre = jnp.minimum(mean_occ, occ_thre)
        binaries = (occs > thre).reshape(state.binaries.shape)
        skip_grid = build_skip_grid(binaries, self.skip_factor)
        return state.replace(
            occs=occs,
            binaries=binaries,
            skip_grid=skip_grid,
            binaries_packed=jax.vmap(bitpack_grid)(binaries),
            skip_packed=jax.vmap(bitpack_grid)(skip_grid),
        )

    # ------------------------------------------------------------------
    def mark_invisible_cells(
        self,
        state: OccGridState,
        K: Array,  # (N, 3, 3) or (1, 3, 3)
        c2w: Array,  # (N, 3, 4) or (N, 4, 4)
        width: int,
        height: int,
        near_plane: float = 0.0,
        chunk: int = 32**3,
    ) -> OccGridState:
        """Mark cells outside every camera frustum with occupancy -1.

        Parity: ``occ_grid.py:262-332``.  Vectorized over (cells, cams) in
        host-side chunks of ``chunk`` cells — at res 128 with many cameras
        the unchunked (N_cams, 3, cells) intermediates would exceed HBM.
        """
        K = jnp.asarray(K, jnp.float32)
        c2w = jnp.asarray(c2w, jnp.float32)
        assert K.ndim == 3 and K.shape[1:] == (3, 3)
        assert c2w.ndim == 3 and c2w.shape[1] in (3, 4)

        n_cams = c2w.shape[0]
        w2c_R = jnp.swapaxes(c2w[:, :3, :3], 1, 2)  # (N, 3, 3)
        w2c_T = -w2c_R @ c2w[:, :3, 3:]  # (N, 3, 1)

        grid_coords = jnp.asarray(self._grid_coords_np)
        res_minus1 = jnp.asarray(
            [r - 1 for r in self.resolution], jnp.float32
        )
        occs = state.occs

        @jax.jit
        def _chunk_mask(coords, aabb):
            x = coords / res_minus1  # (chunk, 3) in [0, 1]
            xyzs_w = (aabb[:3] + x * (aabb[3:] - aabb[:3])).T  # (3, chunk)
            xyzs_c = w2c_R @ xyzs_w + w2c_T  # (N, 3, chunk)
            uvd = K @ xyzs_c  # (N, 3, chunk)
            uv = uvd[:, :2] / uvd[:, 2:]  # (N, 2, chunk)
            in_image = (
                (uvd[:, 2] >= 0)
                & (uv[:, 0] >= 0)
                & (uv[:, 0] < width)
                & (uv[:, 1] >= 0)
                & (uv[:, 1] < height)
            )
            covered = (uvd[:, 2] >= near_plane) & in_image  # (N, chunk)
            count = covered.sum(axis=0) / n_cams
            too_near = ((uvd[:, 2] < near_plane) & in_image).any(axis=0)
            return (count > 0) & (~too_near)

        n_chunks = -(-self.cells_per_lvl // chunk)
        pad = n_chunks * chunk - self.cells_per_lvl
        coords_pad = jnp.pad(grid_coords, ((0, pad), (0, 0)))
        for lvl in range(self.levels):
            masks = [
                _chunk_mask(
                    coords_pad[i * chunk : (i + 1) * chunk], state.aabbs[lvl]
                )
                for i in range(n_chunks)
            ]
            valid_mask = jnp.concatenate(masks)[: self.cells_per_lvl]
            base = lvl * self.cells_per_lvl
            cell_ids = base + jnp.arange(self.cells_per_lvl)
            occs = occs.at[cell_ids].set(jnp.where(valid_mask, 0.0, -1.0))

        return state.replace(occs=occs)
