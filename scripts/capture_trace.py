#!/usr/bin/env python
"""Device-trace profiler: capture the NGP-occ train step with
``jax.profiler`` and print per-HLO-op times.

Parity target: the reference's ``scripts/run_profiler.py`` per-op tables
(torch.profiler).  :mod:`run_profiler` times whole pipeline *stages*;
this script captures a real device timeline (works through the axon
tunnel — the trace carries an ``XLA Ops`` thread with per-op durations)
and aggregates it, which is how the round-2 hot-op inventory was
produced (e.g. the hash-table gradient scatter-add = 30.8 ms = 44% of
the step, the 53 ns/index 2-D selection scatter, the 1.6 ms layout
copies around the encoder gather).

Usage::

    python scripts/capture_trace.py                  # bench defaults
    python scripts/capture_trace.py --rays 8192 --capacity 262144
    python scripts/capture_trace.py --top 40
    python scripts/capture_trace.py --parse-only /tmp/jtrace  # re-parse

The raw trace directory (tensorboard xplane + Chrome trace) is kept for
inspection with the tensorboard profile plugin.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import argparse
import collections
import glob
import gzip
import json
import os


def parse(trace_dir: str, top: int, steps: int) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        print(f"no trace found under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    print(f"trace: {path}")
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e["name"] == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
            if e["name"] == "thread_name":
                tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    agg = collections.Counter()
    total = 0.0
    for e in ev:
        if (
            e.get("ph") == "X"
            and pnames.get(e["pid"], "").startswith("/device:")
            and tnames.get((e["pid"], e["tid"])) == "XLA Ops"
        ):
            agg[e["name"]] += e["dur"]
            total += e["dur"]
    print(f"total device op time: {total / 1e3 / steps:.2f} ms/step")
    for name, us in agg.most_common(top):
        print(f"{us / 1e3 / steps:8.3f} ms  {name[:110]}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=16384)
    p.add_argument("--capacity", type=int, default=1 << 19)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", type=str, default="/tmp/jtrace")
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["f32", "bf16"])
    p.add_argument("--parse-only", type=str, default=None,
                   help="skip capture; parse an existing trace dir")
    p.add_argument("--occ-update", action="store_true",
                   help="trace the occupancy-update graph instead of the "
                        "train step (the 46-48 ms secondary target)")
    p.add_argument("--dump-hlo", type=str, default=None, metavar="PATH",
                   help="AOT-compile the selected graph and write its "
                        "optimized HLO to PATH (matches trace fusion.N "
                        "names to op contents), skipping the device run")
    args = p.parse_args()

    if args.parse_only:
        parse(args.parse_only, args.top, args.steps)
        return

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
    from nerfacc_tpu.models.ngp import NGPRadianceField
    from nerfacc_tpu.rendering import occgrid_render_rays

    aabb = [-1.5] * 3 + [1.5] * 3
    n_rays, cap, step_size = args.rays, args.capacity, 5e-3
    rng = np.random.default_rng(0)
    est = OccGridEstimator(
        roi_aabb=aabb, resolution=128, levels=1, skip_factor=2
    )
    g = (np.arange(128) + 0.5) / 128 * 2 - 1
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    state = est.set_binaries(
        est.init(), jnp.asarray((np.abs(r - 0.45) < 0.08)[None])
    )
    # Honor the same env knobs as bench.py so a trace captured after an
    # A/B sweep profiles exactly the winning configuration.
    field = NGPRadianceField(
        aabb=aabb,
        encoder_type=os.environ.get("BENCH_ENCODER", "fused"),
        n_levels=int(os.environ.get("BENCH_LEVELS", "4")),
        n_features_per_level=int(os.environ.get("BENCH_FEATS", "16")),
        log2_hashmap_size=int(os.environ.get("BENCH_LOG2T", "18")),
        # Match bench.py's default ("factor", the shipped round-3 winner) —
        # "auto" resolves to the scatter fallback in hash_soa.py and would
        # silently trace the wrong backward.
        table_grad=os.environ.get("BENCH_TGRAD", "factor"),
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
    )
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    tx = optax.adam(1e-2, eps=1e-15)
    opt = tx.init(params)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o, rays_d = jnp.asarray(-3.0 * d), jnp.asarray(d)
    pixels = jnp.asarray(rng.random((n_rays, 3), dtype=np.float32))
    bkgd = jnp.ones(3)

    @jax.jit
    def train_step(params, opt, key):
        def loss_fn(p):
            def rgb_sigma_fn(ts, te, ri):
                from nerfacc_tpu.rendering import gather_ray_od
                o, d = gather_ray_od(rays_o, rays_d, ri)
                x = o + ((ts + te) / 2)[:, None] * d
                rgb, s = field.apply(p, x, d)
                return rgb, s[..., 0]

            c, _, _, n, _ = occgrid_render_rays(
                rgb_sigma_fn, None, est, state, rays_o, rays_d,
                near_plane=0.0, far_plane=1e10,
                render_step_size=step_size, render_bkgd=bkgd,
                stratified=True, key=key, sample_capacity=cap,
                max_macro_segments=int(os.environ.get("BENCH_MACROK", "4")),
            )
            return optax.huber_loss(c, pixels, delta=1.0).mean(), n

        (l, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt2, l

    @jax.jit
    def occ_update(state, params, key):
        occ_eval_fn = (
            lambda x: field.apply(params, x, method="query_density")
            * step_size
        )
        return est._update(
            state, step=10**9, occ_eval_fn=occ_eval_fn, key=key,
            # Mirror bench.py's shipped config (SoA probe positions for the
            # fused/grouped encoders) so the trace profiles what the driver
            # measures.
            soa_positions=(
                os.environ.get("BENCH_OCC_SOA", "1") == "1"
                and os.environ.get("BENCH_ENCODER", "fused")
                in ("fused", "grouped")
            ),
        )

    key = jax.random.PRNGKey(0)
    if args.dump_hlo:
        if args.occ_update:
            lowered = occ_update.lower(state, params, key)
        else:
            lowered = train_step.lower(params, opt, key)
        txt = lowered.compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO ({len(txt)} bytes) -> {args.dump_hlo}")
        return
    if args.occ_update:
        outs = occ_update(state, params, key)
        jax.block_until_ready(outs)
        os.makedirs(args.out, exist_ok=True)
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                key, sub = jax.random.split(key)
                outs = occ_update(state, params, sub)
            jax.block_until_ready(outs)
        parse(args.out, args.top, args.steps)
        return

    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt, _ = train_step(params, opt, sub)
    jax.block_until_ready(params)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt, _ = train_step(params, opt, sub)
        jax.block_until_ready(params)
    parse(args.out, args.top, args.steps)


if __name__ == "__main__":
    main()
