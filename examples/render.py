"""Render test views from a trained checkpoint with the iterative
alive-ray renderer (the Instant-NGP-style inference path, §3.4).

Parity: the reference's ``render_image_with_occgrid_test`` usage in its
training scripts' eval paths.

Example:
    python examples/train_ngp_nerf_occ.py --smoke --cpu --model_path /tmp/m.pkl
    python examples/render.py --model_path /tmp/m.pkl --cpu --out /tmp/render
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

from common import Timer, psnr  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.datasets.procedural import make_loaders
from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.models.ngp import NGPRadianceField
from nerfacc_tpu.rendering import gather_ray_od, occgrid_render_rays_test


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--chunk", type=int, default=4096)
    p.add_argument("--max_samples", type=int, default=1024,
                   help="per-ray sample budget for the iterative renderer")
    p.add_argument("--encoder", type=str, default="fused")
    p.add_argument("--levels", type=int, default=None)
    p.add_argument("--feats", type=int, default=None)
    p.add_argument("--log2t", type=int, default=None)
    p.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"],
                   help="field compute precision for inference")
    p.add_argument("--repeat", type=int, default=1,
                   help="render the test set N times; the last pass is "
                        "timed separately (steady-state, post-compile)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if Path(args.model_path).is_dir():
        # orbax checkpoint directory written by the training CLIs
        from nerfacc_tpu.estimators.occ_grid import OccGridState
        from nerfacc_tpu.utils.checkpoint import restore_checkpoint

        ckpt, step = restore_checkpoint(args.model_path, None)
        params = ckpt["params"]
        occ = ckpt["occ_state"]
        if not isinstance(occ, OccGridState):
            occ = OccGridState(
                **{k: jnp.asarray(v) for k, v in occ.items() if v is not None}
            )
        occ_state = occ
        print(f"restored step {step} from {args.model_path}")
    else:
        with open(args.model_path, "rb") as f:
            ckpt = pickle.load(f)
        params, occ_state = ckpt["params"], ckpt["occ_state"]

    # procedural test split (matches the smoke/procedural training configs)
    _, test_ds = make_loaders(num_rays=1, width=96, height=96, n_test=2)
    aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
    levels, res = occ_state.binaries.shape[0], occ_state.binaries.shape[1]
    estimator = OccGridEstimator(roi_aabb=aabb, resolution=res, levels=levels)
    fused = args.encoder in ("fused", "folded")
    field = NGPRadianceField(
        aabb=tuple(np.asarray(estimator._aabbs_np[-1]).tolist()),
        encoder_type=args.encoder,
        n_levels=args.levels or (8 if fused else 16),
        n_features_per_level=args.feats or (16 if fused else 2),
        log2_hashmap_size=args.log2t or (18 if fused else 19),
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
    )

    def builder(rays_o, rays_d):
        def rgb_sigma_fn(ts, te, ri):
            o, d = gather_ray_od(rays_o, rays_d, ri)
            x = o + ((ts + te) / 2)[:, None] * d
            rgb, sigma = field.apply(params, x, d)
            return rgb, sigma[..., 0]

        return rgb_sigma_fn

    def render_view(i):
        batch = test_ds[i]
        rays = batch["rays"]
        h, w = rays.origins.shape[:2]
        o = rays.origins.reshape(-1, 3)
        d = rays.viewdirs.reshape(-1, 3)
        imgs, total = [], 0
        for j in range(0, o.shape[0], args.chunk):
            oc, dc = o[j : j + args.chunk], d[j : j + args.chunk]
            pad = args.chunk - oc.shape[0]
            if pad:
                oc = jnp.concatenate([oc, jnp.broadcast_to(oc[-1:], (pad, 3))])
                dc = jnp.concatenate([dc, jnp.broadcast_to(dc[-1:], (pad, 3))])
            rgb, _, _, n_s = occgrid_render_rays_test(
                builder,
                estimator,
                occ_state,
                oc,
                dc,
                max_samples=args.max_samples,
                samples_per_round=32,
                near_plane=test_ds.near,
                far_plane=test_ds.far,
                render_step_size=5e-3,
                render_bkgd=jnp.ones(3),
            )
            total += n_s
            imgs.append(rgb[: args.chunk - pad if pad else args.chunk])
        img = jnp.concatenate(imgs).reshape(h, w, 3)
        return img, batch, total

    timer = Timer()
    psnrs = []
    n_pix = 0
    for rep in range(args.repeat):
        if rep == args.repeat - 1:
            timer = Timer()  # steady-state window (graphs compiled)
            psnrs, n_pix = [], 0
        for i in range(len(test_ds)):
            img, batch, total = render_view(i)
            p_ = psnr(img, batch["pixels"])
            psnrs.append(p_)
            n_pix += img.shape[0] * img.shape[1]
            print(f"view {i}: PSNR {p_:.2f}, {total} samples")
            if args.out and rep == args.repeat - 1:
                import imageio.v2 as imageio

                Path(args.out).mkdir(parents=True, exist_ok=True)
                imageio.imwrite(
                    f"{args.out}/view_{i}.png",
                    (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8),
                )
    dt = timer.elapsed()
    print(
        f"mean PSNR {np.mean(psnrs):.2f} in {dt:.1f}s "
        f"({n_pix / max(dt, 1e-9):.0f} rays/s"
        f"{' steady-state' if args.repeat > 1 else ''})"
    )


if __name__ == "__main__":
    main()
