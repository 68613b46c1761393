"""Train Instant-NGP (hash grid) with occupancy-grid sampling.

Parity target: ``examples/train_ngp_nerf_occ.py`` — per-dataset config blocks
(synthetic vs mip-360 unbounded), Adam(1e-2, eps=1e-15) + warmup/multistep
schedule, smooth-l1 loss, 20k steps.

TPU design differences (SURVEY §7 decision 5): instead of dynamically
resizing the ray batch to hit 2^18 samples (which would retrace the jitted
step), the ray count is fixed and the *sample capacity* is the static 2^18
budget — same total work at equilibrium, one compiled step.  bfloat16 is
used inside the field MLPs via jax default matmul precision.
"""

from __future__ import annotations

import argparse
import functools

from common import (  # noqa: E402
    MIPNERF360_UNBOUNDED_SCENES,
    NERF_SYNTHETIC_SCENES,
    Timer,
    eval_metrics,
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
from nerfacc_tpu.models.ngp import NGPRadianceField
from nerfacc_tpu.rendering import gather_ray_od, occgrid_render_rays
from nerfacc_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def build_config(args):
    cfg = dict(
        max_steps=20000,
        num_rays=8192,
        target_sample_batch_size=1 << 18,
        weight_decay=1e-6,
        aabb=np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32),
        near_plane=0.0,
        far_plane=1e10,
        grid_resolution=128,
        grid_nlvl=1,
        render_step_size=5e-3,
        alpha_thre=0.0,
        cone_angle=0.0,
        unbounded=False,
    )
    if args.scene in MIPNERF360_UNBOUNDED_SCENES:
        cfg.update(
            weight_decay=0.0,
            aabb=np.array([-1, -1, -1, 1, 1, 1], np.float32),
            near_plane=0.2,
            grid_nlvl=4,
            render_step_size=1e-3,
            alpha_thre=1e-2,
            cone_angle=0.004,
            unbounded=True,
        )
    elif args.scene in ["materials", "ficus", "drums"]:
        cfg.update(weight_decay=1e-5)
    return cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--train_split", type=str, default="train")
    p.add_argument(
        "--scene",
        type=str,
        default="lego",
        choices=NERF_SYNTHETIC_SCENES + MIPNERF360_UNBOUNDED_SCENES + ["procedural"],
    )
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint directory (orbax; saved at the end and "
                        "every --ckpt_every steps)")
    p.add_argument("--resume", action="store_true",
                   help="restore params/opt/occ/step from --model_path")
    p.add_argument("--ckpt_every", type=int, default=0,
                   help="0 = only at the end")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--num_rays", type=int, default=None)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--encoder", type=str, default="fused",
                   choices=["hash", "soa", "fused", "folded", "grouped"],
                   help="'grouped' = the reference's 16Lx2F tcnn shape at "
                        "fused-class speed (one gather per 8 levels)")
    p.add_argument("--field", type=str, default="ngp", choices=["ngp", "tensorf", "kplanes"],
                   help="radiance field family (tensorf/kplanes = the reference's benchmark plug-ins)")
    p.add_argument("--levels", type=int, default=None,
                   help="hash-grid levels; 4 is the measured fast config "
                        "(halves gather/scatter indices), 8 the default")
    p.add_argument("--feats", type=int, default=None)
    p.add_argument("--log2t", type=int, default=None)
    p.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"],
                   help="field compute precision (bf16: ~15%% faster step, "
                        "f32 params/adam; quality-gate clean on the bench)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = build_config(args)
    procedural = args.smoke or args.data_root is None or args.scene == "procedural"
    if procedural:
        cfg["aabb"] = np.array([-1, -1, -1, 1, 1, 1], np.float32)
        cfg["grid_resolution"] = 64 if not args.smoke else 32
        cfg["render_step_size"] = 5e-3 if not args.smoke else 1e-2
        cfg["num_rays"] = 1024 if args.smoke else 4096
        cfg["target_sample_batch_size"] = cfg["num_rays"] * (
            16 if args.smoke else 32
        )
        cfg["max_steps"] = args.max_steps or (200 if args.smoke else 4000)
        train_ds, test_ds = make_loaders(
            num_rays=cfg["num_rays"],
            width=96 if args.smoke else 160,
            height=96 if args.smoke else 160,
            n_train=12 if args.smoke else 36,
            n_test=1 if args.smoke else 2,
        )
        cfg["near_plane"], cfg["far_plane"] = train_ds.near, train_ds.far
    else:
        train_ds = SubjectLoader(
            subject_id=args.scene,
            root_fp=args.data_root,
            split=args.train_split,
            num_rays=cfg["num_rays"],
        )
        test_ds = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
        if args.max_steps:
            cfg["max_steps"] = args.max_steps
    if args.num_rays:
        cfg["num_rays"] = args.num_rays
        train_ds.update_num_rays(args.num_rays)

    max_steps = cfg["max_steps"]
    estimator = OccGridEstimator(
        roi_aabb=cfg["aabb"],
        resolution=cfg["grid_resolution"],
        levels=cfg["grid_nlvl"],
    )
    occ_state = estimator.init()

    field_aabb = tuple(np.asarray(estimator._aabbs_np[-1]).tolist())
    if args.field == "ngp":
        # Fast-config defaults for the fused/folded encoders: 128-float
        # table rows (8 corners x 16 feats) measured ~1.5x faster than
        # 32-float rows.
        fused = args.encoder in ("fused", "folded")
        field = NGPRadianceField(
            aabb=field_aabb,
            unbounded=cfg["unbounded"],
            encoder_type=args.encoder,
            n_levels=args.levels or (8 if fused else 16),
            n_features_per_level=args.feats or (16 if fused else 2),
            log2_hashmap_size=args.log2t or (18 if fused else 19),
            compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
        )
    elif args.field == "tensorf":
        from nerfacc_tpu.models.tensorf import TensoRFRadianceField

        field = TensoRFRadianceField(aabb=field_aabb)
    else:
        from nerfacc_tpu.models.tensorf import KPlanesRadianceField

        field = KPlanesRadianceField(aabb=field_aabb)
    key = jax.random.PRNGKey(42)
    key, sub = jax.random.split(key)
    params = field.init(sub, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"NGP field params: {n_params/1e6:.2f} M")

    # Adam(1e-2, eps 1e-15) + linear warmup + multistep decay (ngp_occ:125-140).
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.01 / 100, 0.01, 100),
            optax.piecewise_constant_schedule(
                0.01,
                {
                    max_steps // 2: 0.33,
                    max_steps * 3 // 4: 0.33,
                    max_steps * 9 // 10: 0.33,
                },
            ),
        ],
        [100],
    )
    tx = optax.chain(
        optax.add_decayed_weights(cfg["weight_decay"]),
        optax.scale_by_adam(eps=1e-15),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
    opt_state = tx.init(params)

    start_step = 0
    if args.resume and args.model_path and latest_step(args.model_path):
        target = {
            "params": params,
            "opt_state": opt_state,
            "occ_state": occ_state,
        }
        state, start_step = restore_checkpoint(args.model_path, target)
        params, opt_state, occ_state = (
            state["params"], state["opt_state"], state["occ_state"],
        )
        print(f"resumed from {args.model_path} at step {start_step}")

    def save_ckpt(step):
        if args.model_path:
            save_checkpoint(
                args.model_path,
                {
                    "params": params,
                    "opt_state": opt_state,
                    "occ_state": occ_state,
                },
                step,
            )
            print(f"saved checkpoint at step {step} -> {args.model_path}")

    sample_capacity = cfg["target_sample_batch_size"]
    eval_chunk = 2048 if args.smoke else 8192

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

    render_kwargs = dict(
        near_plane=cfg["near_plane"],
        far_plane=cfg["far_plane"],
        render_step_size=cfg["render_step_size"],
        cone_angle=cfg["cone_angle"],
        alpha_thre=cfg["alpha_thre"],
    )

    @functools.partial(jax.jit, static_argnames=("max_macro",))
    def train_step(
        params, opt_state, occ_state, rays_o, rays_d, pixels, bkgd, key,
        max_macro: int = 24,
    ):
        def loss_fn(p):
            sigma_fn, rgb_sigma_fn = make_fns(p, rays_o, rays_d)
            colors, _, depths, n_samp, extras = occgrid_render_rays(
                rgb_sigma_fn,
                sigma_fn,
                estimator,
                occ_state,
                rays_o,
                rays_d,
                render_bkgd=bkgd,
                stratified=True,
                key=key,
                sample_capacity=sample_capacity,
                max_macro_segments=max_macro,
                **render_kwargs,
            )
            loss = optax.huber_loss(colors, pixels, delta=1.0).mean()
            mse = jnp.mean((colors - pixels) ** 2)
            return loss, (n_samp, mse, extras["macro_truncated_frac"])

        (loss, (n_samp, mse, trunc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n_samp, mse, trunc

    @functools.partial(jax.jit, static_argnames=("warmup",))
    def occ_update(occ_state, params, key, warmup: bool):
        occ_eval_fn = (
            lambda x: field.apply(params, x, method="query_density")
            * cfg["render_step_size"]
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
            render_bkgd=jnp.ones(3),
            sample_capacity=eval_chunk * 64,
            **render_kwargs,
        )
        return colors

    timer = Timer()
    log_every = max(1, max_steps // 10)
    # Macro-segment budget: starts at the config default and auto-escalates
    # when rays report truncated tails (silent quality loss otherwise —
    # the reference's DDA never truncates, grid.cu:184-272).  Escalation
    # retraces train_step once per doubling (bounded by the 64 cap).
    max_macro = 24
    trunc = None
    for step in range(start_step, max_steps + 1):
        if step % 16 == 0:
            key, sub = jax.random.split(key)
            occ_state = occ_update(occ_state, params, sub, warmup=step < 256)
            # Check the previous step's truncation signal at occ-update
            # cadence (avoids a per-step host sync).
            if trunc is not None and max_macro < 64:
                trunc_frac = float(trunc)
                if trunc_frac > 1e-3:
                    max_macro = min(64, max_macro * 2)
                    print(
                        f"step={step}: {trunc_frac:.1%} of rays macro-"
                        f"truncated; raising max_macro_segments to "
                        f"{max_macro} (retraces once)"
                    )
        batch = train_ds[step % len(train_ds)]
        rays = batch["rays"]
        key, sub = jax.random.split(key)
        params, opt_state, loss, n_samp, mse, trunc = train_step(
            params,
            opt_state,
            occ_state,
            rays.origins,
            rays.viewdirs,
            batch["pixels"],
            batch["color_bkgd"],
            sub,
            max_macro=max_macro,
        )
        if step % log_every == 0:
            train_psnr = -10.0 * np.log10(max(float(mse), 1e-10))
            print(
                f"elapsed={timer.elapsed():.1f}s step={step} "
                f"loss={float(loss):.5f} psnr={train_psnr:.2f} "
                f"n_samples={int(n_samp)} rays={rays.origins.shape[0]}"
            )
        if args.ckpt_every and step and step % args.ckpt_every == 0:
            save_ckpt(step)

    total = timer.elapsed()
    print(f"training done in {total:.1f}s")
    psnrs, ssims = [], []
    for i in range(len(test_ds)):
        batch = test_ds[i]
        img = render_image_chunked(
            lambda o, d: eval_render(params, occ_state, o, d),
            batch["rays"],
            chunk=eval_chunk,
        )
        m = eval_metrics(img, batch["pixels"])
        psnrs.append(m["psnr"])
        ssims.append(m["ms_ssim"])
        extra = (
            f" lpips({m.get('lpips_src', '?')}) {m['lpips']:.4f}"
            if "lpips" in m
            else ""
        )
        print(
            f"  eval img {i}: PSNR {m['psnr']:.2f} ssim {m['ssim']:.4f} "
            f"ms-ssim {m['ms_ssim']:.4f}{extra}"
        )
    print(
        f"FINAL mean PSNR {np.mean(psnrs):.2f} dB "
        f"ms-ssim {np.mean(ssims):.4f} in {total:.1f}s"
    )

    save_ckpt(max_steps)
    return float(np.mean(psnrs))


if __name__ == "__main__":
    main()
