"""Train a time-conditioned T-NeRF on D-NeRF dynamic scenes.

Parity target: ``examples/train_mlp_tnerf.py`` — TNeRF (warp MLP + vanilla
NeRF) with OccGrid estimator whose occupancy probe samples random timestamps
(``mlp.py:260-267`` query_opacity).
"""

from __future__ import annotations

import argparse
import functools

from common import Timer, psnr, render_image_chunked  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.utils.lpips import lpips as _lpips
import optax

from nerfacc_tpu.datasets.dnerf_synthetic import SubjectLoader
from nerfacc_tpu.datasets.procedural import make_dynamic_loaders
from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.models.mlp import TNeRFRadianceField
from nerfacc_tpu.rendering import gather_ray_od, occgrid_render_rays

DNERF_SCENES = [
    "bouncingballs", "hellwarrior", "hook", "jumpingjacks",
    "lego", "mutant", "standup", "trex",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--scene", type=str, default="lego",
                   choices=DNERF_SCENES + ["procedural"])
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--num_rays", type=int, default=1024)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--field", type=str, default="tnerf",
        choices=["tnerf", "ndr", "tineuvox"],
        help="dynamic field family (tineuvox = the reference's benchmark "
        "plug-in, re-implemented natively)",
    )
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    procedural = args.smoke or args.data_root is None or args.scene == "procedural"
    if procedural:
        aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32)
        if args.smoke:
            args.num_rays = min(args.num_rays, 256)
        train_ds, test_ds = make_dynamic_loaders(
            num_rays=args.num_rays,
            width=96 if args.smoke else 128,
            height=96 if args.smoke else 128,
            n_train=12 if args.smoke else 24,
            n_test=1 if args.smoke else 2,
        )
        max_steps = args.max_steps or (150 if args.smoke else 4000)
        grid_resolution = 32 if args.smoke else 64
        render_step_size = 1e-2 if args.smoke else 5e-3
        near, far = train_ds.near, train_ds.far
    else:
        aabb = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)
        train_ds = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root,
            split="train", num_rays=args.num_rays,
        )
        test_ds = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
        max_steps = args.max_steps or 30000
        grid_resolution = 128
        render_step_size = 5e-3
        near, far = 0.0, 1e10

    key = jax.random.PRNGKey(42)
    if args.field == "tineuvox":
        from nerfacc_tpu.models.tineuvox import TiNeuVoxRadianceField

        field = TiNeuVoxRadianceField(
            aabb=tuple(np.asarray(aabb, np.float32).tolist()),
            resolution=32 if args.smoke else 96,
        )
    elif args.field == "ndr":
        from nerfacc_tpu.models.mlp import NDRTNeRFRadianceField

        field = NDRTNeRFRadianceField()
    else:
        field = TNeRFRadianceField()
    key, sub = jax.random.split(key)
    params = field.init(
        sub, jnp.zeros((8, 3)), jnp.zeros((8, 1)), jnp.zeros((8, 3))
    )

    estimator = OccGridEstimator(
        roi_aabb=aabb, resolution=grid_resolution, levels=1
    )
    occ_state = estimator.init()

    tx = optax.adam(5e-4)
    opt_state = tx.init(params)
    sample_capacity = args.num_rays * 48
    eval_chunk = 2048 if args.smoke else 8192

    train_times = jnp.asarray(train_ds.timestamps)

    def make_fns(params, rays_o, rays_d, timestamps):
        def sigma_fn(t_starts, t_ends, ray_indices):
            t_mid = (t_starts + t_ends) / 2.0
            o, d = gather_ray_od(rays_o, rays_d, ray_indices)
            x = o + t_mid[:, None] * d
            t = timestamps[ray_indices]
            return field.apply(params, x, t, method="query_density")[..., 0]

        def rgb_sigma_fn(t_starts, t_ends, ray_indices):
            t_mid = (t_starts + t_ends) / 2.0
            o, d = gather_ray_od(rays_o, rays_d, ray_indices)
            x = o + t_mid[:, None] * d
            t = timestamps[ray_indices]
            rgb, sigma = field.apply(params, x, t, d)
            return rgb, sigma[..., 0]

        return sigma_fn, rgb_sigma_fn

    @jax.jit
    def train_step(params, opt_state, occ_state, rays_o, rays_d,
                   timestamps, pixels, bkgd, key):
        def loss_fn(p):
            sigma_fn, rgb_sigma_fn = make_fns(p, rays_o, rays_d, timestamps)
            colors, _, _, n_samp, _ = occgrid_render_rays(
                rgb_sigma_fn, sigma_fn, estimator, occ_state,
                rays_o, rays_d,
                near_plane=near, far_plane=far,
                render_step_size=render_step_size,
                render_bkgd=bkgd, stratified=True, key=key,
                sample_capacity=sample_capacity,
            )
            return optax.huber_loss(colors, pixels, delta=1.0).mean(), n_samp

        (loss, n_samp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n_samp

    @functools.partial(jax.jit, static_argnames=("warmup",))
    def occ_update(occ_state, params, key, warmup: bool):
        def occ_eval_fn(x):
            # random timestamps per probe point (tnerf query_opacity semantics)
            k = jax.random.fold_in(key, 1)
            idx = jax.random.randint(k, (x.shape[0],), 0, train_times.shape[0])
            t = train_times[idx][:, None]
            return (
                field.apply(params, x, t, method="query_density")
                * render_step_size
            )

        return estimator._update(
            occ_state, step=0 if warmup else 10**9,
            occ_eval_fn=occ_eval_fn, key=key, warmup_steps=1,
        )

    @jax.jit
    def eval_render(params, occ_state, rays_o, rays_d, timestamps):
        sigma_fn, rgb_sigma_fn = make_fns(params, rays_o, rays_d, timestamps)
        colors, _, _, _, _ = occgrid_render_rays(
            rgb_sigma_fn, sigma_fn, estimator, occ_state, rays_o, rays_d,
            near_plane=near, far_plane=far,
            render_step_size=render_step_size,
            render_bkgd=jnp.ones(3),
            sample_capacity=eval_chunk * 48,
        )
        return colors

    timer = Timer()
    for step in range(max_steps + 1):
        if step % 16 == 0:
            key, sub = jax.random.split(key)
            occ_state = occ_update(occ_state, params, sub, warmup=step < 256)
        batch = train_ds[step % len(train_ds)]
        rays = batch["rays"]
        key, sub = jax.random.split(key)
        params, opt_state, loss, n_samp = train_step(
            params, opt_state, occ_state,
            rays.origins, rays.viewdirs, batch["timestamps"],
            batch["pixels"], batch["color_bkgd"], sub,
        )
        if step % max(1, max_steps // 10) == 0:
            print(f"step {step} loss {float(loss):.5f} "
                  f"n_samples {int(n_samp)} elapsed {timer.elapsed():.1f}s")

    print(f"training done in {timer.elapsed():.1f}s")
    psnrs = []
    for i in range(len(test_ds)):
        batch = test_ds[i]
        rays = batch["rays"]
        h, w = rays.origins.shape[:2]
        ts_flat = batch["timestamps"].reshape(-1, 1)

        def rf(o, d, i0=[0]):
            n = o.shape[0]
            start = i0[0]
            ts = jax.lax.dynamic_slice_in_dim(ts_flat, 0, 1)  # same t everywhere
            ts = jnp.broadcast_to(ts, (n, 1))
            i0[0] += n
            return eval_render(params, occ_state, o, d, ts)

        img = render_image_chunked(rf, rays, chunk=eval_chunk)
        p_ = psnr(img, batch["pixels"])
        lp, lp_src = _lpips(img, batch["pixels"])
        psnrs.append(p_)
        print(f"  eval img {i}: PSNR {p_:.2f} lpips({lp_src}) {lp:.4f}")
    print(f"FINAL mean PSNR {np.mean(psnrs):.2f} dB")
    return float(np.mean(psnrs))


if __name__ == "__main__":
    main()
