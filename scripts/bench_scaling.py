"""Scaling-efficiency benchmark: rays/s vs device count on a virtual mesh.

Runs the sharded NGP-occ train step (the same one ``dryrun_multichip``
compiles) at 1/2/4/8 devices and reports rays/s plus parallel efficiency
relative to 1 device.  Each device count runs in a fresh subprocess because
the XLA host-platform device count is fixed at backend init.

On this dev machine only virtual CPU devices exist, so the absolute numbers
are meaningless — the harness is what matters: on a real pod slice, point it
at the TPU backend (drop the CPU forcing) and the same script measures the
BASELINE.md north-star (>85% efficiency 1 -> 2 hosts).

Usage: python scripts/bench_scaling.py [--devices 1,2,4,8] [--rays-per-dev 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import time, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", {n_devices})
import jax.numpy as jnp
import optax
from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.models.ngp import NGPRadianceField
from nerfacc_tpu.parallel import (
    host_local_rays_to_global, make_hybrid_mesh,
    make_parallel_train_step, replicate,
)

n_devices = {n_devices}
n_rays = {rays_per_dev} * n_devices
aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
estimator = OccGridEstimator(roi_aabb=aabb, resolution=32, levels=1)
occ_state = estimator.init()
occ_state = estimator.set_binaries(occ_state, jnp.ones_like(occ_state.binaries))
field = NGPRadianceField(aabb=aabb, n_levels=4, log2_hashmap_size=13, max_resolution=128)
params = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
tx = optax.adam(1e-2)
opt_state = tx.init(params)

hosts = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
mesh = make_hybrid_mesh(jax.devices()[:n_devices], hosts=hosts)
step = make_parallel_train_step(
    field, estimator, tx, mesh, render_step_size=2e-2,
    near_plane=0.5, far_plane=4.0, sample_capacity_per_shard=8192,
)
rng = np.random.default_rng(0)
d = rng.normal(size=(n_rays, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays_o, rays_d, pixels = host_local_rays_to_global(
    mesh, (-2.0 * d, d, rng.random((n_rays, 3)).astype(np.float32)))
params = replicate(params, mesh)
opt_state = replicate(opt_state, mesh)
occ_state = replicate(occ_state, mesh)
bkgd = jnp.ones(3)
key = jax.random.PRNGKey(0)
for i in range(3):  # warmup/compile
    key, sub = jax.random.split(key)
    params, opt_state, loss, n_samp = step(
        params, opt_state, occ_state, rays_o, rays_d, pixels, bkgd, sub)
jax.block_until_ready(params)
iters = {iters}
t0 = time.perf_counter()
for i in range(iters):
    key, sub = jax.random.split(key)
    params, opt_state, loss, n_samp = step(
        params, opt_state, occ_state, rays_o, rays_d, pixels, bkgd, sub)
jax.block_until_ready(params)
dt = time.perf_counter() - t0
print("RESULT", n_devices, n_rays * iters / dt)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--rays-per-dev", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    counts = [int(x) for x in args.devices.split(",")]
    results = {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for n in counts:
        code = _CHILD.format(
            n_devices=n, rays_per_dev=args.rays_per_dev, iters=args.iters
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            env=env,
            timeout=1200,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                _, nd, rps = line.split()
                results[int(nd)] = float(rps)
        if n not in results:
            print(f"device count {n} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr)

    base = results.get(counts[0])
    rows = []
    for n in counts:
        if n in results:
            eff = results[n] / (base * n / counts[0]) if base else float("nan")
            rows.append(
                {"devices": n, "rays_per_sec": round(results[n], 1),
                 "efficiency_vs_linear": round(eff, 3)}
            )
    print(json.dumps({"metric": "scaling_rays_per_sec", "rows": rows}))


if __name__ == "__main__":
    main()
