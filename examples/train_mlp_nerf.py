"""Train a vanilla-NeRF MLP with occupancy-grid sampling.

Parity target: ``examples/train_mlp_nerf.py`` (argparse CLI, OccGrid
estimator, smooth-l1 loss, Adam, PSNR eval, checkpointing).

TPU design: one jitted train step fuses sampling, the field, rendering and
the optimizer update; the occupancy EMA update is a second jitted function
invoked every n steps.  With ``--smoke`` (or no ``--data_root``) the
procedural analytic scene replaces NeRF-Synthetic so the script runs
anywhere, matching BASELINE.json's CPU-runnable conformance config.
"""

from __future__ import annotations

import argparse
import functools

from common import (  # noqa: E402  (sys.path bootstrap)
    NERF_SYNTHETIC_SCENES,
    Timer,
    psnr,
    render_image_chunked,
)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfacc_tpu.datasets.nerf_synthetic import SubjectLoader
from nerfacc_tpu.datasets.procedural import make_loaders
from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.models.mlp import VanillaNeRFRadianceField
from nerfacc_tpu.rendering import gather_ray_od, occgrid_render_rays
from nerfacc_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--train_split", type=str, default="train")
    p.add_argument("--scene", type=str, default="lego", choices=NERF_SYNTHETIC_SCENES + ["procedural"])
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--num_rays", type=int, default=1024)
    p.add_argument("--samples_per_ray", type=int, default=64)
    p.add_argument("--smoke", action="store_true", help="tiny procedural run")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--eval_every", type=int, default=0, help="0 = only at end")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    procedural = args.smoke or args.data_root is None or args.scene == "procedural"
    if procedural:
        aabb = np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], np.float32)
        if args.smoke:
            args.num_rays = min(args.num_rays, 256)
        train_ds, test_ds = make_loaders(
            num_rays=args.num_rays,
            width=96 if args.smoke else 160,
            height=96 if args.smoke else 160,
            n_train=12 if args.smoke else 36,
            n_test=1 if args.smoke else 2,
        )
        max_steps = args.max_steps or (150 if args.smoke else 5000)
        grid_resolution = 32 if args.smoke else 64
        render_step_size = 8e-3 if args.smoke else 5e-3
        near, far = train_ds.near, train_ds.far
    else:
        aabb = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)
        train_ds = SubjectLoader(
            subject_id=args.scene,
            root_fp=args.data_root,
            split=args.train_split,
            num_rays=args.num_rays,
        )
        test_ds = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
        max_steps = args.max_steps or 50000
        grid_resolution = 128
        render_step_size = 5e-3
        near, far = 0.0, 1e10

    key = jax.random.PRNGKey(42)
    field = VanillaNeRFRadianceField()
    key, sub = jax.random.split(key)
    params = field.init(sub, jnp.zeros((8, 3)), jnp.zeros((8, 3)))

    estimator = OccGridEstimator(
        roi_aabb=aabb, resolution=grid_resolution, levels=1
    )
    occ_state = estimator.init()

    lr = 5e-4
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    start_step = 0
    if args.model_path and latest_step(args.model_path):
        target = {
            "params": params, "opt_state": opt_state, "occ_state": occ_state,
        }
        st, start_step = restore_checkpoint(args.model_path, target)
        params, opt_state, occ_state = (
            st["params"], st["opt_state"], st["occ_state"],
        )
        print(f"resumed from {args.model_path} at step {start_step}")

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

    sample_capacity = args.num_rays * args.samples_per_ray
    eval_chunk = 2048 if args.smoke else 8192

    @jax.jit
    def train_step(params, opt_state, occ_state, rays_o, rays_d, pixels, bkgd, key):
        def loss_fn(p):
            sigma_fn, rgb_sigma_fn = make_fns(p, rays_o, rays_d)
            colors, _, _, n_samp, _ = occgrid_render_rays(
                rgb_sigma_fn,
                sigma_fn,
                estimator,
                occ_state,
                rays_o,
                rays_d,
                near_plane=near,
                far_plane=far,
                render_step_size=render_step_size,
                render_bkgd=bkgd,
                stratified=True,
                key=key,
                sample_capacity=sample_capacity,
            )
            loss = optax.huber_loss(colors, pixels, delta=1.0).mean()
            return loss, n_samp

        (loss, n_samp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n_samp

    @functools.partial(jax.jit, static_argnames=("warmup",))
    def occ_update(occ_state, params, key, warmup: bool):
        occ_eval_fn = lambda x: field.apply(
            params, x, render_step_size, method="query_opacity"
        )
        return estimator._update(
            occ_state,
            step=0 if warmup else 10**9,
            occ_eval_fn=occ_eval_fn,
            key=key,
            warmup_steps=1,
        )

    @jax.jit
    def eval_render(params, occ_state, rays_o, rays_d):
        sigma_fn, rgb_sigma_fn = make_fns(params, rays_o, rays_d)
        colors, _, _, _, _ = occgrid_render_rays(
            rgb_sigma_fn,
            sigma_fn,
            estimator,
            occ_state,
            rays_o,
            rays_d,
            near_plane=near,
            far_plane=far,
            render_step_size=render_step_size,
            render_bkgd=jnp.ones(3),
            sample_capacity=eval_chunk * args.samples_per_ray,
        )
        return colors

    timer = Timer()
    for step in range(start_step, max_steps + 1):
        if step % 16 == 0:
            key, sub = jax.random.split(key)
            occ_state = occ_update(
                occ_state, params, sub, warmup=step < 256
            )
        batch = train_ds[step % len(train_ds)]
        rays = batch["rays"]
        key, sub = jax.random.split(key)
        params, opt_state, loss, n_samp = train_step(
            params,
            opt_state,
            occ_state,
            rays.origins,
            rays.viewdirs,
            batch["pixels"],
            batch["color_bkgd"],
            sub,
        )
        if step % max(1, max_steps // 10) == 0:
            print(
                f"step {step} loss {float(loss):.5f} "
                f"n_samples {int(n_samp)} elapsed {timer.elapsed():.1f}s"
            )
        if args.eval_every and step and step % args.eval_every == 0:
            _eval(eval_render, params, occ_state, test_ds, limit=1, eval_chunk=eval_chunk)

    print(f"training done in {timer.elapsed():.1f}s")
    psnrs = _eval(eval_render, params, occ_state, test_ds, eval_chunk=eval_chunk)
    print(f"FINAL mean PSNR {np.mean(psnrs):.2f} dB")

    if args.model_path:
        save_checkpoint(
            args.model_path,
            {
                "params": params,
                "opt_state": opt_state,
                "occ_state": occ_state,
            },
            max_steps,
        )
        print(f"saved checkpoint to {args.model_path}")
    return float(np.mean(psnrs))


def _eval(eval_render, params, occ_state, test_ds, limit=None, eval_chunk=8192):
    from nerfacc_tpu.utils.lpips import lpips

    psnrs = []
    n = len(test_ds) if limit is None else min(limit, len(test_ds))
    for i in range(n):
        batch = test_ds[i]
        img = render_image_chunked(
            lambda o, d: eval_render(params, occ_state, o, d),
            batch["rays"],
            chunk=eval_chunk,
        )
        p = psnr(img, batch["pixels"])
        lp, lp_src = lpips(img, batch["pixels"])
        psnrs.append(p)
        print(f"  eval img {i}: PSNR {p:.2f} lpips({lp_src}) {lp:.4f}")
    return psnrs


if __name__ == "__main__":
    main()
