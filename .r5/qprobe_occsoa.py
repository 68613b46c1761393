"""Device probe: quality-scale (res-64) occ-update, SoA positions on vs off.

Round-5 quality phase regressed ~5x vs round 4 (208 ms/step vs 62); the
per-16-step occ update is the suspect (~2.4 s extra/update).  The only
round-5 change on that path is soa_positions=True.  This times both
variants in ONE process (same RPC bias, same compile cache).
"""
import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.models.ngp import NGPRadianceField

print("backend:", jax.devices()[0].platform, flush=True)

aabb_half = 1.0
occ_res = 64
aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32) * aabb_half
render_step_size = 5e-3 * aabb_half
est = OccGridEstimator(roi_aabb=aabb, resolution=occ_res, levels=1)
occ_state0 = est.init()
field = NGPRadianceField(
    aabb=tuple(np.asarray(est._aabbs_np[-1]).tolist()),
    compute_dtype=jnp.bfloat16,
    table_grad="factor",
    encoder_type="fused",
    n_levels=4,
    n_features_per_level=16,
    log2_hashmap_size=18,
)
key = jax.random.PRNGKey(0)
params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))


def make_update(soa):
    @functools.partial(jax.jit, static_argnames=("warmup",))
    def occ_update(occ_state, params, key, warmup: bool):
        fn = (
            lambda x: field.apply(params, x, method="query_density")
            * render_step_size
        )
        return est._update(
            occ_state, step=0 if warmup else 10**9, occ_eval_fn=fn,
            key=key, warmup_steps=1, soa_positions=soa,
        )

    return occ_update


for soa in (True, False):
    upd = make_update(soa)
    t0 = time.perf_counter()
    st = upd(occ_state0, params, jax.random.PRNGKey(2), warmup=False)
    jax.block_until_ready(st)
    print(f"soa={soa}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    reps = 8
    t0 = time.perf_counter()
    s = st
    for i in range(reps):
        s = upd(s, params, jax.random.PRNGKey(3 + i), warmup=False)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / reps
    print(f"soa={soa}: {dt*1000:.1f} ms/update (batched x{reps})",
          flush=True)
