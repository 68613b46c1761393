#!/usr/bin/env python
"""Stage-level profiler for the NGP-occ training pipeline.

Parity target: the reference's ``scripts/run_profiler.py`` (torch.profiler
per-op tables — stale against its own 0.5 API); here the same job is done
the measurement-honest TPU way: time each pipeline *stage* as its own
jitted graph on the live backend, with inputs varied per iteration and one
device sync per timing window (per-step host reads would serialize every
dispatch with the device round-trip).

Stages: traversal+compaction | field sigma fwd | field fwd+bwd |
render fwd+bwd (field+scans+loss) | optimizer | full train step |
occupancy update.

Usage::

    python scripts/run_profiler.py            # live backend (TPU if present)
    python scripts/run_profiler.py --cpu
    PROF_LEVELS=8 python scripts/run_profiler.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import argparse
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--rays", type=int, default=None)
    p.add_argument("--capacity", type=int, default=None)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
    from nerfacc_tpu.grid import traverse_and_compact
    from nerfacc_tpu.models.ngp import NGPRadianceField
    from nerfacc_tpu.rendering import occgrid_render_rays
    from nerfacc_tpu.volrend import rendering

    on_cpu = jax.devices()[0].platform == "cpu"
    n_rays = args.rays or (512 if on_cpu else 8192)
    cap = args.capacity or ((1 << 14) if on_cpu else (1 << 18))
    step_size = 5e-3
    rng = np.random.default_rng(0)

    aabb = [-1.5] * 3 + [1.5] * 3
    est = OccGridEstimator(
        roi_aabb=aabb, resolution=128, levels=1, skip_factor=2
    )
    g = (np.arange(128) + 0.5) / 128 * 2 - 1
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    state = est.set_binaries(
        est.init(), jnp.asarray((np.abs(r - 0.45) < 0.08)[None])
    )

    field = NGPRadianceField(
        aabb=aabb,
        encoder_type=os.environ.get("PROF_ENCODER", "fused"),
        n_levels=int(os.environ.get("PROF_LEVELS", "4")),
        n_features_per_level=int(os.environ.get("PROF_FEATS", "16")),
        log2_hashmap_size=int(os.environ.get("PROF_LOG2T", "18")),
        compute_dtype=(
            jnp.bfloat16
            if os.environ.get("PROF_DTYPE", "f32") in ("bf16", "bfloat16")
            else None
        ),
    )
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    tx = optax.adam(1e-2, eps=1e-15)
    opt0 = tx.init(params)

    paired = os.environ.get("PROF_PAIRED", "0")
    paired = (
        field.paired_safe_levels(step_size, margin=1.0)
        if paired == "auto"
        else int(paired)
    )
    print(f"paired coarse levels: {paired}", flush=True)

    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-3.0 * d)
    rays_d = jnp.asarray(d)
    pixels = jnp.asarray(rng.random((n_rays, 3), dtype=np.float32))
    bkgd = jnp.ones(3)

    def timeit(name, f, args_fn):
        fj = jax.jit(f)
        jax.block_until_ready(fj(*args_fn(0)))
        argsets = [args_fn(i + 1) for i in range(args.iters)]
        jax.block_until_ready(argsets)
        t0 = time.perf_counter()
        outs = [fj(*a) for a in argsets]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:<28s} {dt:9.2f} ms", flush=True)
        return dt

    def mk_rays(seed):
        rr = np.random.default_rng(seed)
        dd = rr.normal(size=(n_rays, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
        return (jnp.asarray(-3.0 * dd), jnp.asarray(dd))

    def t_traverse(o, dvec):
        cs = traverse_and_compact(
            o, dvec, state.binaries, state.aabbs, cap,
            step_size=step_size, max_lattice_steps=1024,
            skip_grid=state.skip_grid, macro_stride=16,
            max_macro_segments=8,
            packed_grids=state.binaries_packed,
            packed_skip=state.skip_packed,
        )
        return cs.t_starts.sum() + cs.num_valid.sum()

    timeit("traverse+compact", t_traverse, mk_rays)

    def mk_samples(seed):
        rr = np.random.default_rng(seed)
        ri = np.sort(rr.integers(0, n_rays, cap)).astype(np.int32)
        ts = (1.5 + rr.random(cap) * 1.9).astype(np.float32)
        return (jnp.asarray(ri), jnp.asarray(ts), jnp.asarray(ts + step_size))

    # Array-path callbacks (the SoA/chunked-gather variant measured slower
    # in the full graph on v5e; see chunked_ray_components docstring).
    def t_sigma(ri, ts, te):
        x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
        return field.apply(
            params, x, paired_levels=paired, method="query_density"
        ).sum()

    timeit("field sigma fwd", t_sigma, mk_samples)

    def t_encoder_bwd(ri, ts, te):
        def loss(pp):
            x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
            aabb_arr = jnp.asarray(aabb, jnp.float32)
            u = (x - aabb_arr[:3]) / (aabb_arr[3:] - aabb_arr[:3])
            h = field.apply(
                pp, u, method=lambda m, u_: m.encoder(u_)
            )
            return (h.astype(jnp.float32) * ts[:, None]).sum()

        l, grads = jax.value_and_grad(loss)(params)
        return l + jax.tree.reduce(lambda a, b: a + b.sum(), grads, 0.0)

    timeit("encoder fwd+bwd", t_encoder_bwd, mk_samples)

    def t_sigma_bwd(ri, ts, te):
        def loss(pp):
            x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
            s = field.apply(
                pp, x, paired_levels=paired, method="query_density"
            )
            return (s[..., 0] * ts).sum()

        l, grads = jax.value_and_grad(loss)(params)
        return l + jax.tree.reduce(lambda a, b: a + b.sum(), grads, 0.0)

    timeit("sigma fwd+bwd", t_sigma_bwd, mk_samples)

    def t_field_bwd(ri, ts, te):
        def loss(pp):
            x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
            rgb, s = field.apply(pp, x, rays_d[ri], paired_levels=paired)
            return (rgb * ts[:, None]).sum() + s.sum()

        l, grads = jax.value_and_grad(loss)(params)
        return l + jax.tree.reduce(lambda a, b: a + b.sum(), grads, 0.0)

    timeit("field fwd+bwd", t_field_bwd, mk_samples)

    def t_render_bwd(ri, ts, te):
        def loss(pp):
            def rgb_sigma_fn(t0, t1, rix):
                x = rays_o[rix] + ((t0 + t1) / 2)[:, None] * rays_d[rix]
                rgb, s = field.apply(pp, x, rays_d[rix], paired_levels=paired)
                return rgb, s[..., 0]

            c, _, _, _ = rendering(
                ts, te, ray_indices=ri, n_rays=n_rays,
                rgb_sigma_fn=rgb_sigma_fn, render_bkgd=bkgd,
            )
            return optax.huber_loss(c, pixels, delta=1.0).mean()

        l, grads = jax.value_and_grad(loss)(params)
        return l + jax.tree.reduce(lambda a, b: a + b.sum(), grads, 0.0)

    timeit("render fwd+bwd", t_render_bwd, mk_samples)

    # Scan/accumulate-only bisect: rendering() with a field-free callback
    # (precomputed per-sample values), differentiated wrt those values —
    # isolates transmittance scan + weights + accumulations + loss.
    def mk_vals(seed):
        ri, ts, te = mk_samples(seed)
        rin = np.asarray(ri)
        starts = np.searchsorted(rin, np.arange(n_rays)).astype(np.int32)
        counts = (
            np.searchsorted(rin, np.arange(n_rays), side="right").astype(
                np.int32
            )
            - starts
        )
        rr = np.random.default_rng(seed + 7)
        return (
            ri, ts, te,
            jnp.asarray(starts), jnp.asarray(counts),
            jnp.asarray(rr.random((cap, 3), np.float32)),
            jnp.asarray(rr.random((cap,), np.float32)),
        )

    def t_scans(ri, ts, te, sb_lo, sb_ct, rgbs, sigs):
        def loss(rgbs, sigs):
            def rgb_sigma_fn(t0, t1, rix):
                return rgbs, sigs

            c, _, _, _ = rendering(
                ts, te, ray_indices=ri, n_rays=n_rays,
                rgb_sigma_fn=rgb_sigma_fn, render_bkgd=bkgd,
                seg_bounds=(sb_lo, sb_ct),
            )
            return optax.huber_loss(c, pixels, delta=1.0).mean()

        l, (g1, g2) = jax.value_and_grad(loss, argnums=(0, 1))(rgbs, sigs)
        return l + g1.sum() + g2.sum()

    timeit("render scans fwd+bwd", t_scans, mk_vals)

    def t_trans(ri, ts, te, sb_lo, sb_ct, rgbs, sigs):
        from nerfacc_tpu.volrend import render_weight_from_density

        def loss(sigs):
            w, _, _ = render_weight_from_density(
                ts, te, sigs, ray_indices=ri, n_rays=n_rays
            )
            return (w * ts).sum()

        l, g = jax.value_and_grad(loss)(sigs)
        return l + g.sum()

    timeit("transmittance fwd+bwd", t_trans, mk_vals)

    def t_opt(ri, ts, te):
        grads = jax.tree.map(lambda x: x * 1e-3, params)
        u, _ = tx.update(grads, opt0, params)
        p2 = optax.apply_updates(params, u)
        return jax.tree.reduce(lambda a, b: a + b.sum(), p2, 0.0)

    timeit("optimizer", t_opt, mk_samples)

    def mk_key(seed):
        return (jax.random.PRNGKey(seed),)

    def t_step(key):
        def loss_fn(pp):
            def sigma_fn(t0, t1, rix):
                x = rays_o[rix] + ((t0 + t1) / 2)[:, None] * rays_d[rix]
                return field.apply(
                    pp, x, paired_levels=paired, method="query_density"
                )[..., 0]

            def rgb_sigma_fn(t0, t1, rix):
                x = rays_o[rix] + ((t0 + t1) / 2)[:, None] * rays_d[rix]
                rgb, s = field.apply(pp, x, rays_d[rix], paired_levels=paired)
                return rgb, s[..., 0]

            c, _, _, n, _ = occgrid_render_rays(
                rgb_sigma_fn, sigma_fn, est, state, rays_o, rays_d,
                near_plane=0.0, far_plane=1e10,
                render_step_size=step_size, render_bkgd=bkgd,
                stratified=True, key=key, sample_capacity=cap,
                max_macro_segments=8,
            )
            return optax.huber_loss(c, pixels, delta=1.0).mean(), n

        (l, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, _ = tx.update(grads, opt0, params)
        p2 = optax.apply_updates(params, u)
        return l + jax.tree.reduce(lambda a, b: a + b.sum(), p2, 0.0), n

    dt = timeit("FULL train step", t_step, mk_key)
    print(f"{'-> samples/s (cap kept)':<28s} {cap / dt * 1000:12.0f}")

    def t_update(key):
        occ_eval_fn = (
            lambda x: field.apply(params, x, method="query_density")
            * step_size
        )
        s2 = est._update(
            state, step=10**9, occ_eval_fn=occ_eval_fn, key=key
        )
        return s2.occs.sum()

    timeit("occupancy update", t_update, mk_key)


if __name__ == "__main__":
    main()
