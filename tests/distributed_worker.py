"""Worker for the 2-process ``jax.distributed`` CPU test (run by
``tests/test_parallel.py::test_two_process_distributed``, one subprocess per
simulated host).

Exercises the real multi-process branches that single-process tests cannot
reach (VERDICT r2 #6): ``initialize_distributed`` joining a coordinator,
``make_hybrid_mesh``'s ``jax.process_count() > 1`` path
(``parallel/multihost.py``), ``process_local_batch_size``, and
``host_local_rays_to_global``'s ``make_array_from_process_local_data``
assembly where no host holds the global batch.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 local "chips" per host


def main(process_id: int, port: int) -> None:
    import numpy as np

    from nerfacc_tpu.parallel import (
        host_local_rays_to_global,
        initialize_distributed,
        make_hybrid_mesh,
        process_local_batch_size,
    )

    pi, pc = initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert (pi, pc) == (process_id, 2), (pi, pc)
    assert len(jax.devices()) == 4 and jax.local_device_count() == 2

    import jax.numpy as jnp
    import optax

    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
    from nerfacc_tpu.models.ngp import NGPRadianceField
    from nerfacc_tpu.parallel import make_parallel_train_step, replicate

    mesh = make_hybrid_mesh()
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    aabb = [-1, -1, -1, 1, 1, 1]
    estimator = OccGridEstimator(roi_aabb=aabb, resolution=16, levels=1)
    occ_state = estimator.init()
    occ_state = estimator.set_binaries(
        occ_state, jnp.ones_like(occ_state.binaries)
    )
    field = NGPRadianceField(
        aabb=aabb, n_levels=4, log2_hashmap_size=12, max_resolution=64
    )
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    # Per-host input pipeline: each process generates ONLY its own shard of
    # the global ray batch (deterministic split by process index).
    global_batch = 32
    local = process_local_batch_size(global_batch)
    assert local == 16
    rng = np.random.default_rng(7)
    d_all = rng.normal(size=(global_batch, 3)).astype(np.float32)
    d_all /= np.linalg.norm(d_all, axis=-1, keepdims=True)
    px_all = rng.random((global_batch, 3)).astype(np.float32)
    sl = slice(pi * local, (pi + 1) * local)
    ro, rd, px = host_local_rays_to_global(
        mesh, (-2.0 * d_all[sl], d_all[sl], px_all[sl])
    )
    assert ro.shape == (global_batch, 3)

    step = make_parallel_train_step(
        field, estimator, tx, mesh,
        render_step_size=2e-2, near_plane=0.5, far_plane=4.0,
        sample_capacity_per_shard=512,
    )
    params_r = replicate(params, mesh)
    opt_r = replicate(opt_state, mesh)
    occ_r = replicate(occ_state, mesh)

    key = jax.random.PRNGKey(1)
    p1, o1, loss1, n1 = step(
        params_r, opt_r, occ_r, ro, rd, px, jnp.ones(3), key
    )
    p2, o2, loss2, n2 = step(p1, o1, occ_r, ro, rd, px, jnp.ones(3), key)
    l1, l2 = float(loss1), float(loss2)
    assert np.isfinite(l1) and np.isfinite(l2) and l2 < l1, (l1, l2)
    # Printed losses are compared across processes by the parent test —
    # equality proves the psum actually reduced over DCN+ICI.
    print(f"DIST_OK pid={pi} loss1={l1:.8f} loss2={l2:.8f} n={int(n1)}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
