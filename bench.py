"""Benchmark: NGP-occ train throughput (fwd+bwd) + time-to-PSNR on one chip.

Prints ONE JSON line.  Primary metric: samples/s through the fused train
step *including the amortized occupancy-update overhead* (the reference's
269 s wall-clock includes its `update_every_n_steps` — bench.py:5-8 of the
baseline derivation).  Secondary fields: wall-clock to reach the target
eval PSNR on the procedural scene (the BASELINE.md time-to-quality
north-star, measured on a procedural proxy because no dataset ships here).

Baseline derivation: nerfacc NGP-occ trains NeRF-Synthetic Lego for 20k
steps at a dynamic batch targeting 2^18 samples/step in 269 s on a TITAN RTX
(BASELINE.md) => ~19.5 M samples/s forward+backward including the occupancy
update overhead.  ``vs_baseline`` = ours / 19.5e6.

Env knobs: BENCH_ENCODER/BENCH_LEVELS/BENCH_FEATS/BENCH_LOG2T/BENCH_MACROK/
BENCH_SKIPF (field + traversal config), BENCH_QUALITY=0 to skip the
time-to-PSNR phase, BENCH_PSNR_TARGET (default 33 — reference class,
``ngp.rst:17-48``), BENCH_Q_W/BENCH_Q_RAYS/BENCH_Q_STEPS (quality
workload: 800x800 textured procedural views, 8k-ray batches),
BENCH_DELTA_STEPS (fused-vs-hash parity runs; 0 disables).

Resilience: the TPU is reached through a relay that sometimes fails to
initialize (UNAVAILABLE at first device use) or wedges — and the DRIVER
running this script has its own outer timeout (round 3 proved it: rc=124
with an empty stdout).  The top-level process therefore runs the actual
benchmark in a CHILD process and:

- **streams** the child's output live — every JSON record the child
  emits (a *partial* record lands right after the throughput phase) is
  echoed to stdout THE MOMENT it appears, so an outer kill at any point
  still leaves the best-so-far number parseable in the output;
- installs a SIGTERM/SIGINT handler that prints the best record seen
  (or an error record carrying the last verified number) before dying —
  ``timeout(1)`` sends SIGTERM first;
- watchdogs backend init: if the child hasn't reported ``backend up``
  within BENCH_INIT_TIMEOUT (default 600 s) the tunnel is presumed
  wedged, the attempt is killed and retried after a wait (never
  restarting the relay, per the documented protocol);
- fits everything inside a global deadline BENCH_DEADLINE (default
  2400 s wall): attempt timeouts shrink to the remaining budget and the
  child bounds its quality phase to the time actually left.

Whatever happens, stdout ends with exactly one parseable JSON line (an
``error`` field on unrecoverable failure).  Knobs: BENCH_ATTEMPTS
(default 3), BENCH_ATTEMPT_TIMEOUT seconds (default 1800),
BENCH_RETRY_WAITS, BENCH_INIT_TIMEOUT, BENCH_DEADLINE.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def throughput_phase():
    import jax
    import jax.numpy as jnp
    import optax

    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
    from nerfacc_tpu.models.ngp import NGPRadianceField
    from nerfacc_tpu.rendering import occgrid_render_rays

    # Lego-like flagship config (train_ngp_nerf_occ.py synthetic block).
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    # 16k rays / 2^19 capacity: fixed per-step costs (optimizer, amortized
    # occ update, dispatch) are ~19% of the step at 8k/2^18; doubling the
    # batch amortizes them for +9% samples/s (measured; a further doubling
    # adds only +1.6% at 2x the step latency, so stop here).
    n_rays = int(os.environ.get("BENCH_RAYS", "16384"))
    sample_capacity = int(os.environ.get("BENCH_CAP", str(1 << 19)))
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
    n_levels = int(os.environ.get("BENCH_LEVELS", "4"))
    n_feats = int(os.environ.get("BENCH_FEATS", "16"))
    log2_t = int(os.environ.get("BENCH_LOG2T", "18"))
    cdt = (
        jnp.bfloat16
        if os.environ.get("BENCH_DTYPE", "bf16") in ("bf16", "bfloat16")
        else None
    )
    field = NGPRadianceField(
        aabb=aabb,
        encoder_type=encoder_type,
        n_levels=n_levels,
        n_features_per_level=n_feats,
        log2_hashmap_size=log2_t,
        compute_dtype=cdt,
        table_grad=os.environ.get("BENCH_TGRAD", "factor"),
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

    # Chunk-paired coarse encoding: valid because traverse_and_compact emits
    # chunk-of-4 aligned samples (capacity, macro_stride both % 4 == 0 here).
    # Default OFF for training: the fwd gather win is real (measured) but the
    # lerp backward currently costs more than the halved scatter saves.
    paired = os.environ.get("BENCH_PAIRED", "0")
    paired = (
        field.paired_safe_levels(render_step_size, margin=1.0)
        if paired == "auto"
        else int(paired)
    )
    print(f"paired coarse levels: {paired}", flush=True)

    # BENCH_SOA=1: ray components carried through the compaction sort feed
    # the field as 1-D SoA arrays — no per-sample rays_o/rays_d gather, no
    # (n, 3) intermediate.  MEASURED SLIGHTLY NEGATIVE on device (round-4
    # A/B: step 40.17 vs 39.65 ms) — the 6 extra sort operands cost more
    # than the well-fused 12 B-row gathers they replace — so the default
    # stays the array path; the carry machinery remains for fields where
    # the gathers do not fuse.
    use_soa = os.environ.get("BENCH_SOA", "0") == "1" and not paired

    # One 6-wide per-sample gather instead of two 3-wide ones: gathers cost
    # per *index*, not per row byte, and each (n, 3) gather drags its own
    # lane-layout copy behind it (trace: fusion.8/9 + copy.214/215 =
    # 2.6 ms/step).  BENCH_OD_FUSED=0 restores the split gathers for A/B.
    od = jnp.concatenate([rays_o, rays_d], axis=-1)
    od_fused = os.environ.get("BENCH_OD_FUSED", "1") == "1"

    def _gather_od(ri):
        if od_fused:
            g = jnp.take(od, ri, axis=0)
            return g[:, :3], g[:, 3:]
        return rays_o[ri], rays_d[ri]

    def make_fns(params):
        def sigma_fn(ts, te, ri):
            o, d = _gather_od(ri)
            x = o + ((ts + te) / 2)[:, None] * d
            return field.apply(
                params, x, paired_levels=paired, method="query_density"
            )[..., 0]

        def rgb_sigma_fn(ts, te, ri):
            o, d = _gather_od(ri)
            x = o + ((ts + te) / 2)[:, None] * d
            rgb, sigma = field.apply(params, x, d, paired_levels=paired)
            return rgb, sigma[..., 0]

        def rgb_sigma_soa_fn(o, d, ts, te):
            tm = (ts + te) * 0.5
            xs = tuple(o[k] + tm * d[k] for k in range(3))
            rgb, sigma = field.apply(params, xs, d)
            return rgb, sigma[..., 0]

        return sigma_fn, rgb_sigma_fn, (rgb_sigma_soa_fn if use_soa else None)

    @jax.jit
    def train_step(params, opt_state, key):
        def loss_fn(p):
            sigma_fn, rgb_sigma_fn, soa_fn = make_fns(p)
            colors, _, _, n_samp, _ = occgrid_render_rays(
                rgb_sigma_fn,
                sigma_fn,
                estimator,
                occ_state,
                rays_o,
                rays_d,
                rgb_sigma_soa_fn=soa_fn,
                near_plane=0.0,
                far_plane=1e10,
                render_step_size=render_step_size,
                render_bkgd=bkgd,
                stratified=True,
                key=key,
                sample_capacity=sample_capacity,
                # K=4 (round-4 device A/B: 11.19M vs 10.87M samples/s at
                # K5 with the w3 pack) — samples/step stays ~capacity-full
                # down to K4 on the shell workload, so the smaller budget
                # purely cuts traversal; macro truncation is reported in
                # extras if a scene ever outgrows it.
                max_macro_segments=int(os.environ.get("BENCH_MACROK", "4")),
            )
            return optax.huber_loss(colors, pixels, delta=1.0).mean(), n_samp

        (loss, n_samp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n_samp

    # Occupancy update (post-warmup sampling strategy), timed separately and
    # amortized at the reference's every-16-steps cadence.  The *result* is
    # discarded so the controlled shell workload stays fixed for sampling.
    @jax.jit
    def occ_update(occ_state, params, key):
        occ_eval_fn = (
            lambda x: field.apply(params, x, method="query_density")
            * render_step_size
        )
        # SoA probe positions (device A/B r5: fused occ-update 34.8 vs
        # 35.6-36.2 ms) — only the fused/grouped encoders accept tuples.
        # BENCH_OCC_SOA=0 forces the (n, 3) path for A/B.
        return estimator._update(
            occ_state, step=10**9, occ_eval_fn=occ_eval_fn, key=key,
            soa_positions=(
                os.environ.get("BENCH_OCC_SOA", "1") == "1"
                and encoder_type in ("fused", "grouped")
            ),
        )

    # Warmup / compile.
    for i in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, loss, n_samp = train_step(params, opt_state, sub)
    jax.block_until_ready(params)
    _ = occ_update(occ_state, params, key)
    jax.block_until_ready(_)

    # Dispatch the whole window and read sample counts AFTER the clock
    # stops — a per-step host read of `n_samp` would serialize each step
    # with the device round-trip (measured ~25-30 ms on the axon tunnel),
    # which no real training loop pays (CLIs read stats at log points).
    n_iters = 30
    t0 = time.perf_counter()
    n_samps = []
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss, n_samp = train_step(params, opt_state, sub)
        n_samps.append(n_samp)
    jax.block_until_ready(params)
    step_time = time.perf_counter() - t0
    total_samples = int(np.sum([int(x) for x in n_samps]))

    # 8 independent dispatches, ONE block: the per-update number amortizes
    # the ~28 ms tunnel RPC constant 8 ways (at 4 updates that constant
    # alone inflates the mean by ~7 ms — the round-4 32 ms-device vs
    # 57 ms-wall occ-update gap was mostly dispatch/RPC accounting, see
    # docs/PERF.md round-5 section).  A second, serialized forced-read
    # pass goes to stderr for attribution (never into the metric).
    n_updates = 8
    t0 = time.perf_counter()
    outs = []
    for i in range(n_updates):
        key, sub = jax.random.split(key)
        outs.append(occ_update(occ_state, params, sub))
    jax.block_until_ready(outs)
    update_time = (time.perf_counter() - t0) / n_updates
    del outs
    t0 = time.perf_counter()
    for i in range(2):
        key, sub = jax.random.split(key)
        jax.block_until_ready(occ_update(occ_state, params, sub))
    serialized_ms = (time.perf_counter() - t0) / 2 * 1000
    print(
        f"occ-update timing: batched {update_time * 1000:.2f} ms/update, "
        f"serialized-forced-read {serialized_ms:.2f} ms/update "
        f"(delta ~= per-dispatch RPC overhead)",
        file=sys.stderr, flush=True,
    )

    # Amortized: one update per 16 steps (occ_grid.py:223 cadence).
    total_time = step_time + (n_iters / 16.0) * update_time
    samples_per_sec = total_samples / total_time
    return {
        "encoder": encoder_type,
        "samples_per_sec": samples_per_sec,
        "step_ms": round(step_time / n_iters * 1000, 2),
        "occ_update_ms": round(update_time * 1000, 2),
    }


class _QualityRun:
    """One NGP-occ training run on the reference-class procedural proxy.

    The proxy matches the reference quality bar's *shape*
    (``ngp.rst:17-48``: 800x800 views, 33 dB class): textured analytic
    scene (multi-octave color + density ripples — fine levels and table
    capacity matter), 800x800 train/test views, 8k-ray batches.  Reported
    times are train-time only (evals excluded), post-compile — matching
    the reference's convention of timing training and evaluating after.
    """

    def __init__(self, train_ds, test_ds, encoder_cfg: dict, tag: str,
                 seed: int = 42, aabb_half: float = 1.0, occ_res: int = 64):
        import functools

        import jax
        import jax.numpy as jnp
        import optax

        from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
        from nerfacc_tpu.models.ngp import NGPRadianceField
        from nerfacc_tpu.rendering import occgrid_render_rays

        self.jax, self.jnp, self.np = jax, jnp, np
        self.tag = tag
        aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32) * aabb_half
        self.render_step_size = 5e-3 * aabb_half
        num_rays = train_ds.num_rays
        sample_capacity = num_rays * 32
        self.train_ds, self.test_ds = train_ds, test_ds

        estimator = OccGridEstimator(
            roi_aabb=aabb, resolution=occ_res, levels=1
        )
        self.estimator = estimator
        self.occ_state = estimator.init()
        field = NGPRadianceField(
            aabb=tuple(np.asarray(estimator._aabbs_np[-1]).tolist()),
            compute_dtype=(
                jnp.bfloat16
                if os.environ.get("BENCH_DTYPE", "bf16")
                in ("bf16", "bfloat16")
                else None
            ),
            table_grad=os.environ.get("BENCH_TGRAD", "factor"),
            **encoder_cfg,
        )
        self.field = field
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        self.params = field.init(sub, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
        self.key = key
        tx = optax.adam(1e-2, eps=1e-15)
        self.tx = tx
        self.opt_state = tx.init(self.params)

        def make_fns(params, rays_o, rays_d):
            od = jnp.concatenate([rays_o, rays_d], axis=-1)
            od_fused = os.environ.get("BENCH_OD_FUSED", "1") == "1"

            def rgb_sigma_fn(ts, te, ri):
                if od_fused:
                    g = jnp.take(od, ri, axis=0)
                    o, d = g[:, :3], g[:, 3:]
                else:
                    o, d = rays_o[ri], rays_d[ri]
                x = o + ((ts + te) / 2)[:, None] * d
                rgb, sigma = field.apply(params, x, d)
                return rgb, sigma[..., 0]

            return rgb_sigma_fn

        kwargs = dict(
            near_plane=train_ds.near,
            far_plane=train_ds.far,
            render_step_size=self.render_step_size,
        )

        @jax.jit
        def train_step(params, opt_state, occ_state, rays_o, rays_d,
                       pixels, bkgd, key):
            def loss_fn(p):
                rgb_sigma_fn = make_fns(p, rays_o, rays_d)
                colors, _, _, n_samp, _ = occgrid_render_rays(
                    rgb_sigma_fn, None, estimator, occ_state, rays_o,
                    rays_d, render_bkgd=bkgd, stratified=True, key=key,
                    sample_capacity=sample_capacity,
                    # Per-scene macro budget: this scene is solid blobs
                    # (~12 occupied macro segments through centers; K=5
                    # truncates training at 16 dB, measured round 2).
                    max_macro_segments=int(
                        os.environ.get("BENCH_MACROK_Q", "24")
                    ),
                    **kwargs,
                )
                return (
                    optax.huber_loss(colors, pixels, delta=1.0).mean(),
                    n_samp,
                )

            (loss, n_samp), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (
                optax.apply_updates(params, updates), opt_state, loss, n_samp
            )

        @jax.jit
        def train_block(params, opt_state, occ_state, rays_o, rays_d,
                        pixels, bkgds, keys):
            """K train steps in ONE dispatch (lax.scan over stacked
            batches).  Per-step host dispatch through the axon tunnel
            costs a ~10-30 ms RPC constant; at the quality workload's
            ~40 ms device step that constant can multiply wall-clock by
            5x when the tunnel degrades (the round-5 in-bench slowdown:
            208 ms/step in-bench vs 41.7 standalone, same library, same
            PSNR curve).  One fused dispatch per 8-step block makes the
            measured train-time reflect device time."""

            def body(carry, xs):
                p, o = carry
                ro, rd, px, bk, k = xs
                p, o, loss, n_samp = train_step(
                    p, o, occ_state, ro, rd, px, bk, k
                )
                return (p, o), n_samp

            (params, opt_state), n_samps = jax.lax.scan(
                body, (params, opt_state),
                (rays_o, rays_d, pixels, bkgds, keys),
            )
            return params, opt_state, jnp.sum(n_samps)

        @functools.partial(jax.jit, static_argnames=("warmup",))
        def occ_update(occ_state, params, key, warmup: bool):
            occ_eval_fn = (
                lambda x: field.apply(params, x, method="query_density")
                * self.render_step_size
            )
            return estimator._update(
                occ_state, step=0 if warmup else 10**9,
                occ_eval_fn=occ_eval_fn, key=key, warmup_steps=1,
                soa_positions=(
                    os.environ.get("BENCH_OCC_SOA", "1") == "1"
                    and encoder_cfg.get("encoder_type", "fused")
                    in ("fused", "grouped")
                ),
            )

        # Scale the eval chunk down for the scalar-parity encoders: their
        # eval graph's sample-level intermediates are rays*48*n_levels
        # 8-corner gathers, and the 16-level tcnn-parity config at 16384
        # rays exceeded the v5e HBM budget at AOT compile (s32[3*2^25]
        # traversal temps).  The fused/grouped row layouts stay lean at 16k
        # (grouped materializes 2 gathered rows/sample, fewer than fused).
        scalar_parity = encoder_cfg.get("encoder_type", "fused") in (
            "hash", "soa",
        )
        eval_chunk = 4096 if scalar_parity else 16384

        @jax.jit
        def eval_render(params, occ_state, rays_o, rays_d):
            rgb_sigma_fn = make_fns(params, rays_o, rays_d)
            colors, _, _, _, _ = occgrid_render_rays(
                rgb_sigma_fn, None, estimator, occ_state, rays_o, rays_d,
                render_bkgd=jnp.ones(3), sample_capacity=eval_chunk * 48,
                max_macro_segments=int(os.environ.get("BENCH_MACROK_Q", "24")),
                **kwargs,
            )
            return colors

        self._train_step, self._occ_update = train_step, occ_update
        self._train_block = train_block
        # Fused-dispatch block size: divides the 16-step occ cadence so
        # every occ update lands on a block boundary (one compiled shape).
        fuse = int(os.environ.get("BENCH_Q_FUSE", "8"))
        self._fuse = fuse if fuse > 1 and 16 % fuse == 0 else 0

        test_batch = test_ds[0]
        flat_o = np.asarray(test_batch["rays"].origins).reshape(-1, 3)
        flat_d = np.asarray(test_batch["rays"].viewdirs).reshape(-1, 3)
        self._target = np.asarray(test_batch["pixels"]).reshape(-1, 3)
        n = flat_o.shape[0]
        pad = (-n) % eval_chunk
        flat_o = np.concatenate([flat_o, np.broadcast_to(flat_o[-1:], (pad, 3))])
        flat_d = np.concatenate([flat_d, np.broadcast_to(flat_d[-1:], (pad, 3))])
        self._eval_n = n
        self._flat_o = jnp.asarray(flat_o)
        self._flat_d = jnp.asarray(flat_d)
        self._eval_chunk = eval_chunk
        self._eval_render = eval_render

        self.train_elapsed = 0.0  # train-time only (evals excluded)
        self.step = 0
        # Per-step sample counts stay ON DEVICE (a per-step host read would
        # serialize each step with the ~28 ms tunnel round-trip); one
        # stack+sum+read happens only when samples_per_sec() is asked.
        self._n_samps = []

    def eval_psnr(self) -> float:
        # Dispatch all chunks, concatenate on device, ONE host read (a
        # per-chunk np.asarray would serialize ~40 tunnel round-trips).
        jnp = self.jnp
        outs = [
            self._eval_render(
                self.params, self.occ_state,
                self._flat_o[i : i + self._eval_chunk],
                self._flat_d[i : i + self._eval_chunk],
            )
            for i in range(0, self._flat_o.shape[0], self._eval_chunk)
        ]
        img = np.asarray(jnp.concatenate(outs))[: self._eval_n]
        mse = float(np.mean((img - self._target) ** 2))
        return -10.0 * np.log10(max(mse, 1e-10))

    def compile(self):
        """Run one of each graph so the training clock excludes compiles."""
        jax = self.jax
        occ0 = self._occ_update(
            self.occ_state, self.params, self.key, warmup=True
        )
        batch = self.train_ds[0]
        p0, o0, _, _ = self._train_step(
            self.params, self.opt_state, occ0, batch["rays"].origins,
            batch["rays"].viewdirs, batch["pixels"], batch["color_bkgd"],
            jax.random.PRNGKey(0),
        )
        jax.block_until_ready(p0)
        if self._fuse:
            np = self.np
            k = self._fuse
            ro = np.stack([np.asarray(batch["rays"].origins)] * k)
            rd = np.stack([np.asarray(batch["rays"].viewdirs)] * k)
            px = np.stack([np.asarray(batch["pixels"])] * k)
            bk = np.stack([np.asarray(batch["color_bkgd"])] * k)
            pb, ob, _ = self._train_block(
                self.params, self.opt_state, occ0, ro, rd, px, bk,
                jax.random.split(jax.random.PRNGKey(0), k),
            )
            jax.block_until_ready(pb)
        _ = self.eval_psnr()

    def train(self, n_steps: int):
        """Advance ``n_steps`` training steps (timed, no evals inside).

        BENCH_Q_TIMERS=1 prints a host-side attribution per chunk: time
        inside occ-update dispatch, dataset fetch, train-step dispatch,
        and the final device block — the four places a step can lose
        wall-clock (used to hunt the round-5 in-bench slowdown)."""
        jax, np = self.jax, self.np
        timers = os.environ.get("BENCH_Q_TIMERS") == "1"
        profile = os.environ.get("BENCH_Q_PROFILE") == "1"
        prof = None
        if profile:
            import cProfile

            prof = cProfile.Profile()
        t_occ = t_fetch = t_disp = 0.0
        t0 = time.perf_counter()
        done = 0
        n_views = len(self.train_ds)
        while done < n_steps:
            step = self.step
            if step % 16 == 0:
                t1 = time.perf_counter()
                self.key, sub = jax.random.split(self.key)
                self.occ_state = self._occ_update(
                    self.occ_state, self.params, sub, warmup=step < 256
                )
                t_occ += time.perf_counter() - t1
            k = self._fuse
            if k and step % k == 0 and n_steps - done >= k:
                # Fused block: k fetches stacked on host, ONE dispatch.
                # k divides 16, so no occ update falls inside the block.
                t1 = time.perf_counter()
                if prof is not None:
                    prof.enable()
                bs = [
                    self.train_ds[(step + j) % n_views] for j in range(k)
                ]
                ro = np.stack([np.asarray(b["rays"].origins) for b in bs])
                rd = np.stack([np.asarray(b["rays"].viewdirs) for b in bs])
                px = np.stack([np.asarray(b["pixels"]) for b in bs])
                bk = np.stack([np.asarray(b["color_bkgd"]) for b in bs])
                if prof is not None:
                    prof.disable()
                t2 = time.perf_counter()
                t_fetch += t2 - t1
                keys = jax.random.split(self.key, k + 1)
                self.key = keys[0]
                self.params, self.opt_state, n_samp = self._train_block(
                    self.params, self.opt_state, self.occ_state,
                    ro, rd, px, bk, keys[1:],
                )
                t_disp += time.perf_counter() - t2
                self._n_samps.append(n_samp)
                self.step += k
                done += k
                continue
            t1 = time.perf_counter()
            batch = self.train_ds[step % n_views]
            t2 = time.perf_counter()
            t_fetch += t2 - t1
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, _, n_samp = self._train_step(
                self.params, self.opt_state, self.occ_state,
                batch["rays"].origins, batch["rays"].viewdirs,
                batch["pixels"], batch["color_bkgd"], sub,
            )
            t_disp += time.perf_counter() - t2
            self._n_samps.append(n_samp)
            self.step += 1
            done += 1
        t1 = time.perf_counter()
        jax.block_until_ready(self.params)
        t_end = time.perf_counter()
        if timers:
            print(
                f"  [timers {self.tag}] {n_steps} steps: "
                f"occ {t_occ:.2f}s fetch {t_fetch:.2f}s "
                f"dispatch {t_disp:.2f}s block {t_end - t1:.2f}s "
                f"total {t_end - t0:.2f}s",
                file=sys.stderr, flush=True,
            )
        if prof is not None:
            import io
            import pstats

            s = io.StringIO()
            pstats.Stats(prof, stream=s).sort_stats(
                "cumulative"
            ).print_stats(15)
            print(s.getvalue()[:3500], file=sys.stderr, flush=True)
        self.train_elapsed += t_end - t0

    def samples_per_sec(self):
        """Samples/s measured INSIDE this converging run (train-time only,
        occ updates included) — the number that pairs speed with the
        quality the same run earns (VERDICT r4 #6)."""
        if not self._n_samps or self.train_elapsed <= 0:
            return None
        jnp = self.jnp
        total = int(jnp.sum(jnp.stack(self._n_samps)))
        return total / self.train_elapsed


def _quality_data():
    """Quality-phase dataset: NeRF-Synthetic Lego when a real data root is
    available (``NERFACC_DATA_ROOT`` pointing at a dir containing
    ``lego/transforms_train.json`` — the reference's own conformance
    protocol, ``ngp.rst:17-48``), else the textured procedural proxy.
    Returns ``(train_ds, test_ds, data_tag, aabb_half, occ_res)``."""
    width = int(os.environ.get("BENCH_Q_W", "800"))
    num_rays = int(os.environ.get("BENCH_Q_RAYS", "8192"))
    root = os.environ.get("NERFACC_DATA_ROOT", "")
    subject = os.environ.get("BENCH_SUBJECT", "lego")
    if root and os.path.exists(
        os.path.join(root, subject, "transforms_train.json")
    ):
        from nerfacc_tpu.datasets.nerf_synthetic import SubjectLoader

        train_ds = SubjectLoader(
            subject_id=subject, root_fp=root, split="train",
            num_rays=num_rays, color_bkgd_aug="random",
        )
        test_ds = SubjectLoader(
            subject_id=subject, root_fp=root, split="test",
        )
        print(f"  quality: real dataset {subject} from {root}", flush=True)
        # Reference protocol: aabb [-1.5, 1.5]^3, occ grid res 128
        # (train_ngp_nerf_occ.py:54-100).
        return train_ds, test_ds, subject, 1.5, 128
    from nerfacc_tpu.datasets.procedural import make_loaders

    train_ds, test_ds = make_loaders(
        num_rays=num_rays, width=width, height=width, n_train=36, n_test=1,
        detail=1.0,
    )
    print(f"  quality: dataset ready ({width}x{width}, 36 views)", flush=True)
    return train_ds, test_ds, "procedural", 1.0, 64


def quality_phase(psnr_target: float, time_left_fn=None, emit_partial=None):
    """Reference-class quality gate (multi-seed) + encoder-parity deltas.

    Returns ``{psnr_target, time_to_psnr_s[, _spread], final_psnr,
    quality_samples_per_sec, psnr_at_delta_steps[, _spread],
    grouped_equal_step_delta_db, grouped_psnr_final,
    hash_equal_step_delta_db, hash_equal_time_delta_db}``: wall-clock
    (train-only) to the target PSNR — median over BENCH_Q_SEEDS (default
    2) independent seeds with [min, max] spread (VERDICT r4 #5) — plus
    samples/s measured inside the converging run itself (r4 #6), the
    grouped tcnn-SHAPE encoder's 400-step delta (r4 #4), and the exact
    tcnn-parity hash deltas at equal steps / equal wall-clock (r2 #4).
    Knobs: BENCH_Q_W/BENCH_Q_RAYS/BENCH_Q_STEPS/BENCH_Q_EVERY/
    BENCH_Q_SEEDS, BENCH_DELTA_STEPS (0 skips the parity runs),
    BENCH_DELTA_STEPS2 (grouped arm, 0 skips), BENCH_Q_BUDGET (per-run
    train-time cap in seconds), NERFACC_DATA_ROOT (real-data switch).
    """
    max_steps = int(os.environ.get("BENCH_Q_STEPS", "6000"))
    eval_every = int(os.environ.get("BENCH_Q_EVERY", "200"))
    # 200 (not 400): the tcnn-parity hash encoder trains ~30x slower than
    # the fused layout at this workload (2.4 s/step measured), so the
    # equal-step comparison must sit where the hash run can actually reach
    # it inside one bench attempt (200 steps ~ 8 min).  The grouped
    # tcnn-SHAPE arm runs at fused-class speed and gets its own, longer
    # horizon (BENCH_DELTA_STEPS2, default 400).
    delta_steps = int(os.environ.get("BENCH_DELTA_STEPS", "200"))
    n_seeds = max(1, int(os.environ.get("BENCH_Q_SEEDS", "2")))

    train_ds, test_ds, data_tag, aabb_half, occ_res = _quality_data()

    main_cfg = dict(
        encoder_type=os.environ.get("BENCH_ENCODER", "fused"),
        n_levels=int(os.environ.get("BENCH_LEVELS", "4")),
        n_features_per_level=int(os.environ.get("BENCH_FEATS", "16")),
        log2_hashmap_size=int(os.environ.get("BENCH_LOG2T", "18")),
    )

    # Wall-clock budget (train time, per run): cap it so one bench attempt
    # reliably fits the attempt window, and additionally bound it by the
    # wall-clock actually left in this attempt (time_left_fn, parent-fed).
    budget_s = float(os.environ.get("BENCH_Q_BUDGET", "600"))
    if time_left_fn is not None:
        # Reserve headroom for a final eval + the delta phase's compile.
        budget_s = max(60.0, min(budget_s, time_left_fn() * 0.5))

    seed_rows = []
    psnr_at_delta = None
    time_at_delta = None
    out = {"psnr_target": psnr_target, "quality_data": data_tag}
    for si in range(n_seeds):
        if si > 0 and time_left_fn is not None and time_left_fn() < 420:
            out["seed_note"] = (
                f"stopped after {si} seed(s): insufficient time left"
            )
            break
        # Extra seeds exist to bound run-to-run variance of the gate; they
        # stop at the target (or a tight cap) instead of training out.
        s_budget = budget_s if si == 0 else (
            min(300.0, budget_s) if time_left_fn is None
            else max(90.0, min(300.0, time_left_fn() * 0.3))
        )
        run = _QualityRun(
            train_ds, test_ds, main_cfg, tag=f"fused.s{si}",
            seed=42 + 1000 * si, aabb_half=aabb_half, occ_res=occ_res,
        )
        run.compile()  # first seed pays the compiles; the rest hit cache
        reached = None
        psnr_val = 0.0
        p_at_delta = None
        while run.step < max_steps and run.train_elapsed < s_budget:
            n = min(eval_every, max_steps - run.step)
            if delta_steps and run.step < delta_steps:
                n = min(n, delta_steps - run.step)
            run.train(n)
            psnr_val = run.eval_psnr()
            print(
                f"  quality[{run.tag}]: step={run.step} psnr={psnr_val:.2f} "
                f"t={run.train_elapsed:.1f}s", flush=True,
            )
            if delta_steps and run.step == delta_steps and p_at_delta is None:
                p_at_delta = psnr_val
                if si == 0:
                    psnr_at_delta = psnr_val
                    time_at_delta = run.train_elapsed
            if psnr_val >= psnr_target and reached is None:
                reached = run.train_elapsed
                if p_at_delta is not None:
                    break
        seed_rows.append({
            "seed": 42 + 1000 * si,
            "time_to_psnr_s": reached,
            "final_psnr": psnr_val,
            "psnr_at_delta": p_at_delta,
            "samples_per_sec": run.samples_per_sec(),
        })
        if si == 0:
            out["final_psnr"] = round(psnr_val, 2)
            sps = run.samples_per_sec()
            if sps:
                out["quality_samples_per_sec"] = round(sps, 1)

        def _spread(key, digits=1):
            vals = [r[key] for r in seed_rows if r[key] is not None]
            if not vals:
                return {}
            med = float(np.median(vals))
            d = {key: round(med, digits)}
            if len(vals) > 1:
                d[key + "_spread"] = [
                    round(min(vals), digits), round(max(vals), digits)
                ]
            return d

        out.update(_spread("time_to_psnr_s"))
        out.update(_spread("psnr_at_delta", digits=2))
        if "psnr_at_delta" in out:
            out["psnr_at_delta_steps"] = out.pop("psnr_at_delta")
            if "psnr_at_delta_spread" in out:
                out["psnr_at_delta_steps_spread"] = out.pop(
                    "psnr_at_delta_spread"
                )
            out["delta_steps"] = delta_steps
        out["quality_seeds"] = len(seed_rows)
        # The quality numbers are earned incrementally — put each seed's
        # aggregate on the wire before the next phase can die.
        if emit_partial is not None:
            emit_partial(out)

    if delta_steps and psnr_at_delta is not None:
        if time_left_fn is not None and time_left_fn() < 240:
            out["delta_error"] = "skipped: insufficient time left in attempt"
            return out
        # Encoder-parity arms on the same data.  Their failure must not
        # discard the quality numbers already earned above.
        try:
            d_budget = budget_s
            if time_left_fn is not None:
                d_budget = max(60.0, min(budget_s, time_left_fn() - 180))
            out.update(_delta_phase(
                train_ds, test_ds, delta_steps, d_budget,
                psnr_at_delta, time_at_delta, aabb_half, occ_res,
                emit_partial=lambda d: (
                    emit_partial(dict(out, **d))
                    if emit_partial is not None else None
                ),
                time_left_fn=time_left_fn,
            ))
        except Exception as e:
            import traceback

            traceback.print_exc()
            out["delta_error"] = repr(e)[:500]
    return out


def _delta_phase(train_ds, test_ds, delta_steps, budget_s, psnr_at_delta,
                 time_at_delta, aabb_half=1.0, occ_res=64,
                 emit_partial=None, time_left_fn=None):
        out = {}
        # Arm 1 — the tcnn-SHAPE fast path (grouped encoder, 16L x 2F x
        # 2^19 entries, the reference's exact model shape at its exact
        # parameter count): trains at fused-class speed, so it runs to a
        # 400+-step horizon the scalar-parity arm can never reach
        # in-budget (VERDICT r4 #4: "delta phase able to reach 400+
        # steps").  Reports its equal-step delta vs the fused run AND its
        # measured step time on this real converging workload.
        g_steps = int(os.environ.get("BENCH_DELTA_STEPS2", "400"))
        if g_steps:
            try:
                grp = _QualityRun(
                    train_ds, test_ds,
                    dict(encoder_type="grouped", n_levels=16,
                         n_features_per_level=2, log2_hashmap_size=19),
                    tag="grouped", aabb_half=aabb_half, occ_res=occ_res,
                )
                grp.compile()
                g_budget = budget_s
                if time_left_fn is not None:
                    g_budget = max(60.0, min(budget_s, time_left_fn() - 240))
                p_g_delta = None
                p_g = 0.0
                while grp.step < g_steps and grp.train_elapsed < g_budget:
                    n = min(200, g_steps - grp.step)
                    if grp.step < delta_steps:
                        n = min(n, delta_steps - grp.step)
                    grp.train(n)
                    p_g = grp.eval_psnr()
                    print(
                        f"  quality[{grp.tag}]: step={grp.step} "
                        f"psnr={p_g:.2f} t={grp.train_elapsed:.1f}s",
                        flush=True,
                    )
                    if grp.step == delta_steps and p_g_delta is None:
                        p_g_delta = p_g
                if p_g_delta is not None:
                    out["grouped_equal_step_delta_db"] = round(
                        psnr_at_delta - p_g_delta, 2
                    )
                out["grouped_steps"] = grp.step
                out["grouped_psnr_final"] = round(p_g, 2)
                if grp.step:
                    out["grouped_step_ms"] = round(
                        grp.train_elapsed / grp.step * 1000, 1
                    )
                sps_g = grp.samples_per_sec()
                if sps_g:
                    out["grouped_samples_per_sec"] = round(sps_g, 1)
                if emit_partial is not None:
                    emit_partial(out)
            except Exception as e:
                import traceback

                traceback.print_exc()
                out["grouped_error"] = repr(e)[:300]

        # Arm 2 — the scalar-exact tcnn-parity encoder (reference NGP
        # config, ngp.py:99-137): equal-step and equal-wall-clock deltas
        # quantify what the fast layouts trade for their speed.
        hash_cfg = dict(
            encoder_type=os.environ.get("BENCH_DELTA_ENCODER", "hash"),
            n_levels=16, n_features_per_level=2, log2_hashmap_size=19,
        )
        if time_left_fn is not None and time_left_fn() < 240:
            out["delta_error"] = "hash arm skipped: insufficient time left"
            return out
        ref = _QualityRun(train_ds, test_ds, hash_cfg, tag="hash",
                          aabb_half=aabb_half, occ_res=occ_res)
        ref.compile()
        psnr_h_step = None
        psnr_h_time = None
        chunk = 100
        h_budget = budget_s
        if time_left_fn is not None:
            h_budget = max(60.0, min(budget_s, time_left_fn() - 180))
        while ref.step < 4 * delta_steps and ref.train_elapsed < h_budget:
            if ref.step:
                # Time-aware chunks: the hash run measured 2.4 s/step at the
                # 800x800 workload — fixed 100-step chunks are 4-minute
                # blind spots that overshoot budgets. Aim for ~45 s chunks.
                per = ref.train_elapsed / ref.step
                chunk = max(10, min(100, int(45.0 / max(per, 1e-6))))
            n = (
                min(chunk, delta_steps - ref.step)
                if ref.step < delta_steps
                else chunk
            )
            if psnr_h_time is None and ref.step > 0:
                # Aim the equal-WALL-CLOCK eval at the fused run's elapsed
                # train time without overshooting by a whole chunk.
                per = ref.train_elapsed / ref.step
                to_time = int((time_at_delta - ref.train_elapsed) / per) + 1
                if to_time <= n:
                    n = max(1, to_time)
            ref.train(n)
            p = ref.eval_psnr()
            print(
                f"  quality[{ref.tag}]: step={ref.step} psnr={p:.2f} "
                f"t={ref.train_elapsed:.1f}s", flush=True,
            )
            if ref.step >= delta_steps and psnr_h_step is None:
                psnr_h_step = p
            if ref.train_elapsed >= time_at_delta and psnr_h_time is None:
                psnr_h_time = p
            if psnr_h_step is not None and psnr_h_time is not None:
                break
        if psnr_h_step is not None:
            out["hash_equal_step_delta_db"] = round(
                psnr_at_delta - psnr_h_step, 2
            )
        if psnr_h_time is not None:
            out["hash_equal_time_delta_db"] = round(
                psnr_at_delta - psnr_h_time, 2
            )
        return out


BASELINE_SPS = 19.5e6  # reference: 2^18 samples/step * 20k steps / 269 s


def _error_record(msg: str) -> dict:
    return {
        "metric": "ngp_occ_train_samples_per_sec",
        "value": 0.0,
        "unit": "samples/s (fwd+bwd, incl. occ-update overhead)",
        "vs_baseline": 0.0,
        "error": msg[:400],
    }


# A verified record from the last fully successful run, kept next to this
# file.  If the relay is wedged for the entire retry budget, the error line
# still carries the most recent *measured* number (clearly labeled with its
# timestamp — it is evidence, not the round's metric).
_LAST_GOOD_PATH = os.environ.get(
    "BENCH_LAST_GOOD_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".bench_last_good.json"),
)


def _save_last_good(record: dict) -> None:
    if os.environ.get("BENCH_CPU") == "1":
        return  # dev-check smoke numbers are not evidence
    if not record.get("value"):
        return  # a zero/absent primary metric is not a "good" record
    try:
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump(dict(record, measured_at_unix=round(time.time(), 1),
                           measured_at=time.strftime(
                               "%Y-%m-%dT%H:%M:%SZ", time.gmtime())), f)
    except OSError:
        pass


def _load_last_good():
    try:
        with open(_LAST_GOOD_PATH) as f:
            rec = json.load(f)
        return rec if isinstance(rec, dict) else None
    except (OSError, ValueError):
        return None


def child_main():
    """The actual benchmark. Prints a partial JSON record after the
    throughput phase (and after the main quality run), then the final one;
    the parent relays each to stdout the moment it appears."""
    t_child = time.monotonic()
    attempt_budget = float(os.environ.get("BENCH_TIME_LEFT", "1800"))

    def time_left():
        return attempt_budget - (time.monotonic() - t_child)

    # Fail fast (and cheap) if the backend can't come up at all.
    import jax

    if os.environ.get("BENCH_CPU") == "1":  # dev-check smoke path
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: every bench attempt re-pays minutes of
    # remote compiles for identical graphs; a disk cache makes attempt 2+
    # (and every A/B probe) start hot.  BENCH_JAX_CACHE= (empty) disables.
    cache_dir = os.environ.get("BENCH_JAX_CACHE", "/root/repo/.jax_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception as e:  # cache support is backend-dependent
            print(f"[cache] disabled: {e!r}", file=sys.stderr, flush=True)
    import jax.numpy as jnp

    jnp.ones((8,), jnp.float32).sum().block_until_ready()
    print(f"backend up: {jax.devices()[0].platform}", file=sys.stderr, flush=True)

    if os.environ.get("BENCH_THROUGHPUT", "1") != "0":
        out = throughput_phase()
        record = {
            "metric": "ngp_occ_train_samples_per_sec",
            "encoder": out["encoder"],
            "value": round(out["samples_per_sec"], 1),
            "unit": "samples/s (fwd+bwd, incl. occ-update overhead)",
            "vs_baseline": round(out["samples_per_sec"] / BASELINE_SPS, 3),
            "step_ms": out["step_ms"],
            "occ_update_ms": out["occ_update_ms"],
        }
        # Phase hygiene: drop the throughput phase's device buffers and
        # compiled executables before the quality runs (leftover HBM
        # pressure / allocator state is the prime suspect for the round-5
        # quality-phase slowdown — the same _QualityRun steps at 41.7 ms
        # standalone but ~208 ms inside the full bench).
        import gc

        gc.collect()
        arrs = jax.live_arrays()
        tot = sum(a.nbytes for a in arrs)
        print(
            f"[mem] live device arrays after throughput: {len(arrs)}, "
            f"{tot / 1e9:.2f} GB",
            file=sys.stderr, flush=True,
        )
        if os.environ.get("BENCH_PHASE_CLEAR", "1") == "1":
            jax.clear_caches()
            gc.collect()
            arrs = jax.live_arrays()
            tot = sum(a.nbytes for a in arrs)
            print(
                f"[mem] after clear_caches+gc: {len(arrs)} arrays, "
                f"{tot / 1e9:.2f} GB",
                file=sys.stderr, flush=True,
            )
    else:  # quality-only debug runs (BENCH_THROUGHPUT=0)
        record = {"metric": "ngp_occ_train_samples_per_sec", "value": 0.0,
                  "unit": "quality-only run", "vs_baseline": 0.0}
    if os.environ.get("BENCH_QUALITY", "1") != "0":
        print(json.dumps(dict(record, partial=True)), flush=True)

        def emit_partial(quality_out):
            print(json.dumps(dict(record, **quality_out, partial=True)),
                  flush=True)

        try:
            record.update(quality_phase(
                float(os.environ.get("BENCH_PSNR_TARGET", "33")),
                time_left_fn=time_left, emit_partial=emit_partial,
            ))
        except Exception as e:  # keep the primary metric even if phase 2 dies
            import traceback

            traceback.print_exc()  # full story to stderr for post-mortems
            record["quality_error"] = repr(e)[:2000]
    print(json.dumps(record), flush=True)


def _last_json_line(text: str):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if isinstance(rec, dict) and "metric" in rec:
                return rec
    return None


def parent_main():
    """Retry harness: run child_main in a subprocess with bounded retries
    and waits (the relay protocol: wait, never restart).

    Driver-timeout-proof by construction: every record the child prints is
    relayed to stdout immediately; SIGTERM/SIGINT finalize the best-so-far
    record before exit; a watchdog kills an attempt whose backend never
    comes up; and all attempts+waits fit inside BENCH_DEADLINE.  Stdout
    always ends with one parseable JSON line.
    """
    import queue
    import signal
    import subprocess
    import threading

    t_start = time.monotonic()
    deadline = float(os.environ.get("BENCH_DEADLINE", "2400"))
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1800"))
    init_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT", "600"))
    waits = [
        float(w)
        for w in os.environ.get("BENCH_RETRY_WAITS", "60,180,300").split(",")
    ]

    state = {"best": None, "finalized": False, "proc": None,
             "relayed_final": False}

    def finalize(reason=None):
        """Print the definitive last line exactly once (signal-safe-ish)."""
        if state["finalized"]:
            return
        state["finalized"] = True
        best = state["best"]
        if best is not None:
            rec = dict(best)
            was_partial = rec.pop("partial", None)
            if was_partial:
                rec["quality_error"] = rec.get(
                    "quality_error", "quality phase did not complete"
                )
            if reason:
                rec.setdefault("note", str(reason)[:300])
            _save_last_good(rec)
            # Don't re-print a final record already relayed verbatim — a
            # consumer counting JSON lines would double-count the run.
            if not (state["relayed_final"] and not was_partial
                    and not reason):
                print(json.dumps(rec), flush=True)
        else:
            err = _error_record(str(reason or "no record produced"))
            prior = _load_last_good()
            if prior is not None:
                err["last_known_good"] = prior
            print(json.dumps(err), flush=True)

    def on_signal(signum, frame):
        finalize(f"killed by signal {signum} after "
                 f"{time.monotonic() - t_start:.0f}s")
        proc = state["proc"]
        if proc is not None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    last_err = "no attempts ran"
    for attempt in range(attempts):
        remaining = deadline - (time.monotonic() - t_start)
        if remaining < 180:
            last_err = f"deadline exhausted ({remaining:.0f}s left)"
            break
        budget = min(attempt_timeout, remaining - 30)
        print(
            f"[bench] attempt {attempt + 1}/{attempts} "
            f"(budget {budget:.0f}s)", file=sys.stderr, flush=True,
        )
        env = dict(os.environ, BENCH_CHILD="1",
                   BENCH_TIME_LEFT=str(int(budget)))
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, start_new_session=True, bufsize=1,
        )
        state["proc"] = proc

        lines: "queue.Queue" = queue.Queue()

        def pump(p=proc, q=lines):
            for line in p.stdout:
                q.put(line)
            q.put(None)

        threading.Thread(target=pump, daemon=True).start()

        t_attempt = time.monotonic()
        saw_backend = False
        got_final = False
        tail = []
        rc = None
        while True:
            elapsed = time.monotonic() - t_attempt
            if elapsed > budget or (not saw_backend
                                    and elapsed > init_timeout):
                why = ("attempt timeout" if elapsed > budget
                       else "backend-init watchdog (tunnel wedged?)")
                print(f"[bench] {why} after {elapsed:.0f}s — killing child",
                      file=sys.stderr, flush=True)
                # Kill the exact process group we started; a killed TPU
                # process can wedge the relay, so the retry adds settle time.
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                rc = "timeout"
                break
            try:
                line = lines.get(timeout=5.0)
            except queue.Empty:
                continue
            if line is None:
                proc.wait()
                rc = proc.returncode
                break
            tail.append(line)
            tail = tail[-40:]
            s = line.strip()
            if "backend up" in s:
                saw_backend = True
            rec = None
            if s.startswith("{") and s.endswith("}"):
                try:
                    obj = json.loads(s)
                    if isinstance(obj, dict) and "metric" in obj:
                        rec = obj
                except ValueError:
                    pass
            if rec is not None and "error" not in rec:
                # Relay to stdout NOW — an outer kill after this point
                # still leaves the number parseable in the output.
                print(json.dumps(rec), flush=True)
                prev = state["best"]
                if (prev is None or not rec.get("partial")
                        or prev.get("partial")):
                    state["best"] = rec
                if not rec.get("partial"):
                    got_final = True
                    state["relayed_final"] = True
            else:
                sys.stderr.write(line)
                sys.stderr.flush()
        state["proc"] = None
        if got_final:
            finalize()
            return
        best = state["best"]
        if best is not None and "time_to_psnr_s" in best:
            # Throughput AND the main quality numbers are already earned —
            # only the delta phase died. A full retry would re-pay ~20 min
            # of compiles for a secondary field; finalize with what we have.
            finalize(f"delta phase incomplete (attempt rc={rc})")
            return
        last_err = (f"attempt {attempt + 1} rc={rc}; "
                    f"tail: {''.join(tail)[-300:]}")
        if attempt + 1 < attempts:
            wait = waits[min(attempt, len(waits) - 1)]
            if rc == "timeout":
                wait += 60.0  # extra settle time after a killed TPU process
            wait = max(0.0, min(
                wait, deadline - (time.monotonic() - t_start) - 240
            ))
            print(f"[bench] waiting {wait:.0f}s before retry",
                  file=sys.stderr, flush=True)
            time.sleep(wait)
    finalize(last_err)


def main():
    if os.environ.get("BENCH_CHILD") == "1":
        child_main()
    else:
        parent_main()


if __name__ == "__main__":
    main()
