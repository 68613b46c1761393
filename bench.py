"""Benchmark: NGP-occ fused train step throughput (fwd+bwd) on one chip.

Prints ONE JSON line with samples/s against the reference baseline.

Baseline derivation: nerfacc NGP-occ trains NeRF-Synthetic Lego for 20k
steps at a dynamic batch targeting 2^18 samples/step in 269 s on a TITAN RTX
(BASELINE.md) => ~19.5 M samples/s forward+backward including the occupancy
update overhead.  ``vs_baseline`` = ours / 19.5e6.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
    from nerfacc_tpu.models.ngp import NGPRadianceField
    from nerfacc_tpu.rendering import occgrid_render_rays

    import os
    # Lego-like flagship config (train_ngp_nerf_occ.py synthetic block).
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    n_rays = 8192
    sample_capacity = 1 << 18
    render_step_size = 5e-3

    skip_factor = int(os.environ.get("BENCH_SKIPF", "2"))
    estimator = OccGridEstimator(
        roi_aabb=aabb, resolution=128, levels=1, skip_factor=skip_factor
    )
    occ_state = estimator.init()
    # Converged-equilibrium-like occupancy: a spatially coherent shell
    # (an object surface) occupying ~8% of cells — random occupancy would be
    # unrealistically pessimal for macro skipping.
    rng = np.random.default_rng(0)
    g = (np.arange(128) + 0.5) / 128 * 2 - 1
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    occ = (np.abs(r - 0.45) < 0.08)[None]
    print(f"occupancy fraction: {occ.mean():.4f}", flush=True)
    occ_state = estimator.set_binaries(occ_state, jnp.asarray(occ))

    encoder_type = os.environ.get("BENCH_ENCODER", "fused")
    n_levels = int(os.environ.get("BENCH_LEVELS", "8"))
    n_feats = int(os.environ.get("BENCH_FEATS", "16"))
    log2_t = int(os.environ.get("BENCH_LOG2T", "18"))
    field = NGPRadianceField(
        aabb=aabb,
        encoder_type=encoder_type,
        n_levels=n_levels,
        n_features_per_level=n_feats,
        log2_hashmap_size=log2_t,
    )
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))

    tx = optax.adam(1e-2, eps=1e-15)
    opt_state = tx.init(params)

    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-3.0 * d)
    rays_d = jnp.asarray(d)
    pixels = jnp.asarray(rng.random((n_rays, 3), dtype=np.float32))
    bkgd = jnp.ones(3)

    def make_fns(params):
        def sigma_fn(ts, te, ri):
            x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
            return field.apply(params, x, method="query_density")[..., 0]

        def rgb_sigma_fn(ts, te, ri):
            x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
            rgb, sigma = field.apply(params, x, rays_d[ri])
            return rgb, sigma[..., 0]

        return sigma_fn, rgb_sigma_fn

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            sigma_fn, rgb_sigma_fn = make_fns(p)
            colors, _, _, n_samp, _ = occgrid_render_rays(
                rgb_sigma_fn,
                sigma_fn,
                estimator,
                occ_state,
                rays_o,
                rays_d,
                near_plane=0.0,
                far_plane=1e10,
                render_step_size=render_step_size,
                render_bkgd=bkgd,
                stratified=True,
                key=key,
                sample_capacity=sample_capacity,
                max_macro_segments=int(os.environ.get("BENCH_MACROK", "16")),
            )
            return optax.huber_loss(colors, pixels, delta=1.0).mean(), n_samp

        (loss, n_samp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n_samp

    # Warmup / compile.
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss, n_samp = train_step(params, opt_state, sub)
    jax.block_until_ready(params)

    n_iters = 30
    t0 = time.perf_counter()
    total_samples = 0
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss, n_samp = train_step(params, opt_state, sub)
        total_samples += int(n_samp)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0

    samples_per_sec = total_samples / dt
    baseline = 19.5e6  # reference: 2^18 samples/step * 20k steps / 269 s
    print(
        json.dumps(
            {
                "metric": "ngp_occ_train_samples_per_sec",
                "encoder": encoder_type,
                "value": round(samples_per_sec, 1),
                "unit": "samples/s (fwd+bwd)",
                "vs_baseline": round(samples_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
