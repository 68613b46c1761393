"""Sharded (multi-chip) training-step builders for the occ-grid pipeline.

The distributed design (new vs the single-GPU reference — SURVEY §2.11/§5.8):
the whole per-shard render pipeline (traversal, compaction, field, scans,
accumulation) runs inside ``shard_map`` over the ``data`` mesh axis with
*local* static shapes, so no collective touches the hot path; the only
cross-chip traffic is

- the scalar loss ``pmean`` (so ``jax.grad`` through it yields the gradient
  all-reduce — XLA emits one fused ``psum`` over ICI per step), and
- the occupancy-grid EMA merge: each chip probes a shard of cells and the
  grids merge with ``pmax`` (max is associative — exactly the reference's
  EMA-max semantics, ``occ_grid.py:396-398``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

import optax

from ..estimators.occ_grid import OccGridEstimator
from ..rendering import gather_ray_od, occgrid_render_rays

Array = jnp.ndarray


def _linear_index(axis):
    """Flat device index over one axis name or a tuple of them."""
    if isinstance(axis, str):
        return jax.lax.axis_index(axis)
    idx = jax.lax.axis_index(axis[0])
    for a in axis[1:]:
        idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
    return idx


def make_parallel_train_step(
    field,
    estimator: OccGridEstimator,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    render_step_size: float,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    cone_angle: float = 0.0,
    alpha_thre: float = 0.0,
    sample_capacity_per_shard: int = 1 << 15,
    axis=None,
) -> Callable:
    """Build a jitted data-parallel train step.

    Signature of the returned function:
    ``(params, opt_state, occ_state, rays_o, rays_d, pixels, bkgd, key)
    -> (params, opt_state, loss, n_samples)``
    with rays/pixels sharded on their leading axis and everything else
    replicated.

    ``axis`` defaults to *all* mesh axes — on a 2-D ``(hosts, chips)``
    hybrid mesh (:func:`~nerfacc_tpu.parallel.multihost.make_hybrid_mesh`)
    rays shard over both and the gradient reduction becomes hierarchical
    (ICI within host, one DCN hop across hosts).
    """
    if axis is None:
        axis = tuple(mesh.axis_names)

    def make_fns(params, rays_o, rays_d):
        # One fused (n, 6) od gather per callback (see gather_ray_od).
        def sigma_fn(t_starts, t_ends, ray_indices):
            t_mid = (t_starts + t_ends) / 2.0
            o, d = gather_ray_od(rays_o, rays_d, ray_indices)
            x = o + t_mid[:, None] * d
            return field.apply(params, x, method="query_density")[..., 0]

        def rgb_sigma_fn(t_starts, t_ends, ray_indices):
            t_mid = (t_starts + t_ends) / 2.0
            o, d = gather_ray_od(rays_o, rays_d, ray_indices)
            x = o + t_mid[:, None] * d
            rgb, sigma = field.apply(params, x, d)
            return rgb, sigma[..., 0]

        return sigma_fn, rgb_sigma_fn

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        # Pallas calls run inside (factor table-grad kernels, occ query);
        # their out_shape carries no vma annotation, which check_vma
        # rejects — disable the check, as the occ-update shard_map already
        # does.  Collective correctness is covered by the cross-device
        # equality assertions in tests/test_parallel.py.
        check_vma=False,
    )
    def shard_loss(params, occ_state, rays_o, rays_d, pixels, bkgd, key):
        key = jax.random.fold_in(key, _linear_index(axis))
        sigma_fn, rgb_sigma_fn = make_fns(params, rays_o, rays_d)
        colors, _, _, n_samp, _ = occgrid_render_rays(
            rgb_sigma_fn,
            sigma_fn,
            estimator,
            occ_state,
            rays_o,
            rays_d,
            near_plane=near_plane,
            far_plane=far_plane,
            render_step_size=render_step_size,
            render_bkgd=bkgd,
            cone_angle=cone_angle,
            alpha_thre=alpha_thre,
            stratified=True,
            key=key,
            sample_capacity=sample_capacity_per_shard,
        )
        loss = optax.huber_loss(colors, pixels, delta=1.0).mean()
        # Global mean loss -> grad of it carries the psum all-reduce.
        loss = jax.lax.pmean(loss, axis)
        n_samp = jax.lax.psum(n_samp, axis)
        return loss, n_samp

    @jax.jit
    def train_step(params, opt_state, occ_state, rays_o, rays_d, pixels, bkgd, key):
        (loss, n_samp), grads = jax.value_and_grad(
            lambda p: shard_loss(
                p, occ_state, rays_o, rays_d, pixels, bkgd, key
            ),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n_samp

    return train_step


def make_parallel_occ_update(
    field,
    estimator: OccGridEstimator,
    mesh: Mesh,
    *,
    render_step_size: float,
    axis=None,
    occ_thre: float = 1e-2,
    ema_decay: float = 0.95,
):
    """Build a jitted sharded occupancy update.

    Each chip probes its own cell sample (different fold_in key) and the
    EMA-updated grids merge with ``pmax`` — more probe coverage per wall
    clock than the reference's single-GPU update, identical semantics.
    ``axis`` defaults to all mesh axes (works on hybrid 2-D meshes).
    """
    if axis is None:
        axis = tuple(mesh.axis_names)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def _sharded_update(occ_state, params, key):
        key = jax.random.fold_in(key, _linear_index(axis))
        occ_eval_fn = (
            lambda x: field.apply(params, x, method="query_density")
            * render_step_size
        )
        new_state = estimator._update(
            occ_state,
            step=10**9,  # post-warmup sampling strategy
            occ_eval_fn=occ_eval_fn,
            key=key,
            occ_thre=occ_thre,
            ema_decay=ema_decay,
        )
        occs = jax.lax.pmax(new_state.occs, axis)
        binaries = jax.lax.pmax(
            new_state.binaries.astype(jnp.int32), axis
        ).astype(bool)
        return new_state.replace(occs=occs, binaries=binaries)

    @jax.jit
    def occ_update(occ_state, params, key):
        return _sharded_update(occ_state, params, key)

    return occ_update


def make_parallel_propnet_train_step(
    field,
    prop_nets,
    estimator,
    tx_field: optax.GradientTransformation,
    tx_prop: optax.GradientTransformation,
    mesh: Mesh,
    *,
    num_samples: int = 48,
    prop_samples=(256, 96),
    near_plane: float = 0.2,
    far_plane: float = 1e3,
    sampling_type: str = "lindisp",
    opaque_bkgd: bool = True,
    prop_loss_scaler: float = 1.0,
    axis=None,
) -> Callable:
    """Data-parallel PropNet train step (VERDICT r2 #6: the propnet pipeline
    under sharding, not just occ-grid).

    The whole two-estimator pipeline — iterative importance sampling,
    proposal nets, radiance field, PDF matching loss
    (``prop_net.py:131-154`` semantics) — runs per-shard inside
    ``shard_map``; the combined loss is ``pmean``-ed so one ``psum``
    all-reduces BOTH parameter sets' gradients; the two optax optimizers
    apply outside on replicated params (the flattened two-optimizer flow of
    ``examples/train_ngp_nerf_prop.py``).

    Returns ``step(field_params, prop_params, opt_field, opt_prop, rays_o,
    rays_d, pixels, bkgd, key, requires_grad) -> (field_params, prop_params,
    opt_field, opt_prop, loss, mse, prop_loss)`` with rays/pixels sharded on
    their leading axis.
    """
    from ..rendering import propnet_render_rays

    if axis is None:
        axis = tuple(mesh.axis_names)

    def render(field_params, prop_params, rays_o, rays_d, bkgd, key,
               requires_grad, stratified):
        def rgb_sigma_fn(ts, te):
            tm = ((ts + te) / 2.0)[..., None]
            x = rays_o[:, None] + tm * rays_d[:, None]
            d = jnp.broadcast_to(rays_d[:, None], x.shape)
            rgb, sigma = field.apply(field_params, x, d)
            return rgb, sigma[..., 0]

        prop_fns = [
            (lambda ts, te, net=net, pp=pp: net.apply(
                pp,
                rays_o[:, None]
                + ((ts + te) / 2.0)[..., None] * rays_d[:, None],
            )[..., 0])
            for net, pp in zip(prop_nets, prop_params)
        ]
        return propnet_render_rays(
            rgb_sigma_fn, prop_fns, estimator, rays_o, rays_d,
            num_samples=num_samples, prop_samples=list(prop_samples),
            near_plane=near_plane, far_plane=far_plane,
            sampling_type=sampling_type, opaque_bkgd=opaque_bkgd,
            render_bkgd=bkgd, stratified=stratified,
            requires_grad=requires_grad, key=key,
        )

    def make_shard_loss(requires_grad: bool):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), (P(), P())),
            check_vma=False,  # Pallas out_shape has no vma (see above)
        )
        def shard_loss(params, rays_o, rays_d, pixels, bkgd, key):
            fp, pp = params
            key = jax.random.fold_in(key, _linear_index(axis))
            colors, _, _, extras = render(
                fp, pp, rays_o, rays_d, bkgd, key,
                requires_grad=requires_grad, stratified=True,
            )
            loss = optax.huber_loss(colors, pixels, delta=1.0).mean()
            mse = jnp.mean((colors - pixels) ** 2)
            prop_loss = estimator.compute_loss(
                extras["prop_cache"], extras["trans"],
                loss_scaler=prop_loss_scaler,
            )
            total = jax.lax.pmean(loss + prop_loss, axis)
            return total, (jax.lax.pmean(mse, axis),
                           jax.lax.pmean(prop_loss, axis))

        return shard_loss

    @functools.partial(jax.jit, static_argnames=("requires_grad",))
    def train_step(field_params, prop_params, opt_field, opt_prop,
                   rays_o, rays_d, pixels, bkgd, key,
                   requires_grad: bool = True):
        shard_loss = make_shard_loss(requires_grad)
        (loss, (mse, prop_loss)), (gf, gp) = jax.value_and_grad(
            lambda fp, pp: shard_loss(
                (fp, pp), rays_o, rays_d, pixels, bkgd, key
            ),
            argnums=(0, 1),
            has_aux=True,
        )(field_params, prop_params)
        uf, opt_field = tx_field.update(gf, opt_field)
        field_params = optax.apply_updates(field_params, uf)
        if requires_grad:
            up, opt_prop = tx_prop.update(gp, opt_prop)
            prop_params = optax.apply_updates(prop_params, up)
        return (field_params, prop_params, opt_field, opt_prop, loss, mse,
                prop_loss)

    return train_step


def make_parallel_test_renderer(
    field,
    estimator: OccGridEstimator,
    mesh: Mesh,
    *,
    render_step_size: float,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    cone_angle: float = 0.0,
    alpha_thre: float = 0.0,
    early_stop_eps: float = 1e-4,
    samples_per_round: int = 32,
    max_samples: int = 1024,
    axis=None,
) -> Callable:
    """Sharded iterative alive-ray inference renderer (VERDICT r2 #6: the
    test-mode pipeline under sharding).

    Rays shard over the mesh; each round runs the windowed
    traverse->compact->field->accumulate pipeline per shard inside
    ``shard_map`` (no collectives in the round body — carried state arrays
    are sharded like the rays).  The host loop stops on the GLOBAL alive
    count (one scalar read per round), so every shard runs the same number
    of rounds — the SPMD analogue of ``examples/utils.py:253-425``'s alive
    loop.  Capacity is fixed per round (bucketing is a single-chip compile
    economy; under SPMD uniform shapes win).

    Returns ``render(params, occ_state, rays_o, rays_d, render_bkgd)
    -> (rgb, opacity, depth, n_rounds)``.
    """
    from ..grid import traverse_grids
    from ..pack import compact_indices_from_counts
    from ..volrend import render_weight_from_density

    if axis is None:
        axis = tuple(mesh.axis_names)
    n_shards = int(np.prod([mesh.shape[a] for a in (
        (axis,) if isinstance(axis, str) else axis
    )]))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,  # Pallas out_shape has no vma (see above)
    )
    def round_fn(params, occ_state, rays_o, rays_d, near_planes, alive,
                 rgb, opacity, depth):
        n_local = rays_o.shape[0]
        capacity = n_local * samples_per_round
        res = traverse_grids(
            rays_o,
            rays_d,
            occ_state.binaries,
            occ_state.aabbs,
            near_planes=near_planes,
            far_planes=jnp.full((n_local,), far_plane, rays_o.dtype),
            step_size=render_step_size,
            cone_angle=cone_angle,
            traverse_steps_limit=samples_per_round,
            rays_mask=alive,
            max_lattice_steps=samples_per_round * 8,
            packed_grids=occ_state.binaries_packed,
        )
        gather_idx, ray_indices, kept = compact_indices_from_counts(
            res.num_valid, samples_per_round, capacity
        )
        t_starts = res.t_starts.reshape(-1)[gather_idx]
        t_ends = res.t_ends.reshape(-1)[gather_idx]
        t_ends = jnp.where(kept, t_ends, t_starts)

        tm = (t_starts + t_ends) / 2.0
        o, d = gather_ray_od(rays_o, rays_d, ray_indices)
        x = o + tm[:, None] * d
        rgbs, sigmas = field.apply(params, x, d)
        sigmas = jnp.where(kept, sigmas[..., 0], 0.0)
        weights, _, alphas = render_weight_from_density(
            t_starts,
            t_ends,
            sigmas,
            ray_indices=ray_indices,
            n_rays=n_local,
            prefix_trans=1.0 - opacity[ray_indices, 0],
        )
        if alpha_thre > 0:
            weights = jnp.where(alphas >= alpha_thre, weights, 0.0)
        rgb = rgb + jax.ops.segment_sum(
            weights[:, None] * rgbs, ray_indices, num_segments=n_local
        )
        opacity = opacity + jax.ops.segment_sum(
            weights[:, None], ray_indices, num_segments=n_local
        )
        depth = depth + jax.ops.segment_sum(
            (weights * tm)[:, None], ray_indices, num_segments=n_local
        )
        near_planes = res.termination_planes
        alive = (
            alive
            & (opacity[:, 0] <= 1.0 - early_stop_eps)
            & (near_planes < res.far_effective - 1e-6)
        )
        return near_planes, alive, rgb, opacity, depth

    round_fn_jit = jax.jit(round_fn)

    def render(params, occ_state, rays_o, rays_d, render_bkgd=None):
        n_rays = rays_o.shape[0]
        assert n_rays % n_shards == 0, (n_rays, n_shards)
        dtype = rays_o.dtype
        near_planes = jnp.full((n_rays,), near_plane, dtype)
        alive = jnp.ones((n_rays,), bool)
        rgb = jnp.zeros((n_rays, 3), dtype)
        opacity = jnp.zeros((n_rays, 1), dtype)
        depth = jnp.zeros((n_rays, 1), dtype)
        n_rounds = 0
        for _ in range(max(1, max_samples // samples_per_round)):
            if int(jnp.sum(alive.astype(jnp.int32))) == 0:
                break
            near_planes, alive, rgb, opacity, depth = round_fn_jit(
                params, occ_state, rays_o, rays_d, near_planes, alive,
                rgb, opacity, depth,
            )
            n_rounds += 1
        if render_bkgd is not None:
            rgb = rgb + render_bkgd * (1.0 - opacity)
        depth = depth / jnp.clip(opacity, min=jnp.finfo(dtype).eps)
        return rgb, opacity, depth, n_rounds

    return render
