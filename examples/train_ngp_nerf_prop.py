"""Train Instant-NGP with proposal-network (PDF) resampling.

Parity target: ``examples/train_ngp_nerf_prop.py`` — two NGPDensityField
proposal levels + NGP radiance field, annealed prop-grad cadence, two
optimizers (field + prop nets).

TPU design: the reference's inverted control flow (estimator owns a torch
optimizer and backprops cached graphs inside ``update_every_n_steps``) is
flattened — one jitted step takes grads of
``render_loss + prop_loss * scaler`` over (field, prop) params jointly and
applies two optax optimizers (see ``estimators/prop_net.py`` docstring).
Two step variants are compiled for requires_grad True/False (the annealed
cadence, ``prop_net.py:196-212``).
"""

from __future__ import annotations

import argparse
import functools

from common import (  # noqa: E402
    MIPNERF360_UNBOUNDED_SCENES,
    NERF_SYNTHETIC_SCENES,
    Timer,
    psnr,
)

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.utils.lpips import lpips as _lpips
import optax

from nerfacc_tpu.datasets.nerf_synthetic import SubjectLoader
from nerfacc_tpu.datasets.procedural import make_loaders
from nerfacc_tpu.estimators.prop_net import (
    PropNetEstimator,
    get_proposal_requires_grad_fn,
)
from nerfacc_tpu.models.ngp import NGPDensityField, NGPRadianceField
from nerfacc_tpu.rendering import propnet_render_rays


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--train_split", type=str, default="train")
    p.add_argument(
        "--scene", type=str, default="lego",
        choices=NERF_SYNTHETIC_SCENES + MIPNERF360_UNBOUNDED_SCENES + ["procedural"],
    )
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--encoder", type=str, default="fused", choices=["hash", "soa", "fused", "folded"])
    p.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"],
                   help="field compute precision (f32 params/adam)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    unbounded = args.scene in MIPNERF360_UNBOUNDED_SCENES
    procedural = args.smoke or args.data_root is None or args.scene == "procedural"

    if unbounded:
        aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
        near_plane, far_plane = 0.2, 1e3
        sampling_type = "lindisp"
        num_samples, prop_samples = 48, (256, 96)
        max_res_prop = (128, 256)
        opaque_bkgd = True
    else:
        aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
        near_plane, far_plane = 2.0, 6.0
        sampling_type = "uniform"
        num_samples, prop_samples = 64, (128,)
        max_res_prop = (128,)
        opaque_bkgd = False

    if procedural:
        aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
        num_rays = 256 if args.smoke else 4096
        train_ds, test_ds = make_loaders(
            num_rays=num_rays,
            width=96 if args.smoke else 160,
            height=96 if args.smoke else 160,
            n_train=12 if args.smoke else 36,
            n_test=1 if args.smoke else 2,
        )
        near_plane, far_plane = train_ds.near, train_ds.far
        max_steps = args.max_steps or (200 if args.smoke else 4000)
        num_samples, prop_samples = (32, (64,)) if args.smoke else (48, (128,))
    else:
        num_rays = 4096
        train_ds = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root,
            split=args.train_split, num_rays=num_rays,
        )
        test_ds = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
        max_steps = args.max_steps or 20000

    key = jax.random.PRNGKey(42)
    fused = args.encoder in ("fused", "folded")
    cdt = jnp.bfloat16 if args.dtype == "bf16" else None
    field = NGPRadianceField(
        aabb=tuple(aabb), unbounded=unbounded, encoder_type=args.encoder,
        n_levels=8 if fused else 16,
        n_features_per_level=16 if fused else 2,
        log2_hashmap_size=18 if fused else 19,
        compute_dtype=cdt,
    )
    key, sub = jax.random.split(key)
    field_params = field.init(sub, jnp.zeros((8, 3)), jnp.zeros((8, 3)))

    prop_nets = [
        NGPDensityField(
            aabb=tuple(aabb), unbounded=unbounded,
            n_levels=5, max_resolution=mr, encoder_type=args.encoder,
            compute_dtype=cdt,
        )
        for mr in max_res_prop
    ]
    prop_params = []
    for net in prop_nets:
        key, sub = jax.random.split(key)
        prop_params.append(net.init(sub, jnp.zeros((8, 3))))
    prop_params = tuple(prop_params)

    estimator = PropNetEstimator()
    requires_grad_fn = get_proposal_requires_grad_fn()

    tx_field = optax.adam(1e-2, eps=1e-15)
    tx_prop = optax.adam(1e-2, eps=1e-15)
    opt_field = tx_field.init(field_params)
    opt_prop = tx_prop.init(prop_params)

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
                rays_o[:, None] + ((ts + te) / 2.0)[..., None] * rays_d[:, None],
            )[..., 0])
            for net, pp in zip(prop_nets, prop_params)
        ]
        return propnet_render_rays(
            rgb_sigma_fn, prop_fns, estimator, rays_o, rays_d,
            num_samples=num_samples, prop_samples=prop_samples,
            near_plane=near_plane, far_plane=far_plane,
            sampling_type=sampling_type, opaque_bkgd=opaque_bkgd,
            render_bkgd=bkgd, stratified=stratified,
            requires_grad=requires_grad, key=key,
        )

    @functools.partial(jax.jit, static_argnames=("requires_grad",))
    def train_step(field_params, prop_params, opt_field, opt_prop,
                   rays_o, rays_d, pixels, bkgd, key, requires_grad: bool):
        def loss_fn(fp, pp):
            colors, _, _, extras = render(
                fp, pp, rays_o, rays_d, bkgd, key,
                requires_grad=requires_grad, stratified=True,
            )
            loss = optax.huber_loss(colors, pixels, delta=1.0).mean()
            mse = jnp.mean((colors - pixels) ** 2)
            prop_loss = estimator.compute_loss(
                extras["prop_cache"], extras["trans"], loss_scaler=1.0
            )
            return loss + prop_loss, (mse, prop_loss)

        (loss, (mse, prop_loss)), (gf, gp) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(field_params, prop_params)
        uf, opt_field = tx_field.update(gf, opt_field)
        field_params = optax.apply_updates(field_params, uf)
        if requires_grad:
            up, opt_prop = tx_prop.update(gp, opt_prop)
            prop_params = optax.apply_updates(prop_params, up)
        return field_params, prop_params, opt_field, opt_prop, loss, mse, prop_loss

    @jax.jit
    def eval_render(field_params, prop_params, rays_o, rays_d):
        colors, _, _, _ = render(
            field_params, prop_params, rays_o, rays_d, jnp.ones(3),
            None, requires_grad=False, stratified=False,
        )
        return colors

    timer = Timer()
    log_every = max(1, max_steps // 10)
    for step in range(max_steps + 1):
        batch = train_ds[step % len(train_ds)]
        rays = batch["rays"]
        key, sub = jax.random.split(key)
        rg = requires_grad_fn(step)
        (field_params, prop_params, opt_field, opt_prop,
         loss, mse, prop_loss) = train_step(
            field_params, prop_params, opt_field, opt_prop,
            rays.origins, rays.viewdirs, batch["pixels"],
            batch["color_bkgd"], sub, requires_grad=rg,
        )
        if step % log_every == 0:
            print(f"elapsed={timer.elapsed():.1f}s step={step} "
                  f"loss={float(loss):.5f} "
                  f"psnr={-10*np.log10(max(float(mse),1e-10)):.2f} "
                  f"prop_loss={float(prop_loss):.5f}")

    print(f"training done in {timer.elapsed():.1f}s")
    psnrs = []
    chunk = 2048 if args.smoke else 8192
    for i in range(len(test_ds)):
        batch = test_ds[i]
        rays = batch["rays"]
        h, w = rays.origins.shape[:2]
        o = rays.origins.reshape(-1, 3)
        d = rays.viewdirs.reshape(-1, 3)
        n = o.shape[0]
        pad = (-n) % chunk
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))])
        outs = [
            eval_render(field_params, prop_params, o[j : j + chunk], d[j : j + chunk])
            for j in range(0, n + pad, chunk)
        ]
        img = jnp.concatenate(outs)[:n].reshape(h, w, 3)
        p_ = psnr(img, batch["pixels"])
        lp, lp_src = _lpips(img, batch["pixels"])
        psnrs.append(p_)
        print(f"  eval img {i}: PSNR {p_:.2f} lpips({lp_src}) {lp:.4f}")
    print(f"FINAL mean PSNR {np.mean(psnrs):.2f} dB")
    return float(np.mean(psnrs))


if __name__ == "__main__":
    main()
