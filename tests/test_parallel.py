"""Multi-device tests on the virtual 8-CPU mesh: sharded training step
consistency and occupancy pmax merge."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.models.ngp import NGPRadianceField
from nerfacc_tpu.parallel import (
    make_mesh,
    make_parallel_occ_update,
    make_parallel_train_step,
    replicate,
    shard_rays,
)


def _setup(n_rays):
    aabb = [-1, -1, -1, 1, 1, 1]
    estimator = OccGridEstimator(roi_aabb=aabb, resolution=16, levels=1)
    occ_state = estimator.init()
    occ_state = estimator.set_binaries(
        occ_state, jnp.ones_like(occ_state.binaries)
    )
    field = NGPRadianceField(
        aabb=aabb, n_levels=4, log2_hashmap_size=12, max_resolution=64
    )
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))

    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-2.0 * d)
    rays_d = jnp.asarray(d)
    pixels = jnp.asarray(rng.random((n_rays, 3), dtype=np.float32))
    return field, estimator, occ_state, params, rays_o, rays_d, pixels


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_train_step_runs_and_reduces():
    n_rays = 64
    field, estimator, occ_state, params, rays_o, rays_d, pixels = _setup(n_rays)
    mesh = make_mesh(jax.devices()[:8])
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    step = make_parallel_train_step(
        field, estimator, tx, mesh,
        render_step_size=2e-2, near_plane=0.5, far_plane=4.0,
        sample_capacity_per_shard=512,
    )
    params_r = replicate(params, mesh)
    opt_r = replicate(opt_state, mesh)
    occ_r = replicate(occ_state, mesh)
    ro = shard_rays(rays_o, mesh)
    rd = shard_rays(rays_d, mesh)
    px = shard_rays(pixels, mesh)

    key = jax.random.PRNGKey(1)
    p1, o1, loss1, n1 = step(
        params_r, opt_r, occ_r, ro, rd, px, jnp.ones(3), key
    )
    p2, o2, loss2, n2 = step(p1, o1, occ_r, ro, rd, px, jnp.ones(3), key)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # same batch twice must improve
    assert int(n1) > 0
    # params identical across devices (all-reduce consistency)
    leaf = jax.tree.leaves(p1)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_occ_update_pmax_merges():
    field, estimator, occ_state, params, *_ = _setup(8)
    mesh = make_mesh(jax.devices()[:8])
    occ_update = make_parallel_occ_update(
        field, estimator, mesh, render_step_size=2e-2
    )
    params_r = replicate(params, mesh)
    occ_r = replicate(occ_state.replace(
        binaries=jnp.zeros_like(occ_state.binaries)
    ), mesh)
    new_state = occ_update(occ_r, params_r, jax.random.PRNGKey(0))
    # NGP init density is positive (trunc_exp(-1) ~ 0.37), so probed cells
    # must have positive occupancy after the merge.
    assert float(new_state.occs.max()) > 0
    # replicated output consistent across devices
    shards = [np.asarray(s.data) for s in new_state.occs.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_hybrid_mesh_train_step():
    """2-D (hosts x chips) hybrid-mesh path: a simulated 2x4 mesh must train
    and keep params replicated — the multi-host (DCN x ICI) code path run on
    the virtual mesh (SURVEY §5.8)."""
    from nerfacc_tpu.parallel import (
        host_local_rays_to_global,
        make_hybrid_mesh,
    )

    n_rays = 64
    field, estimator, occ_state, params, rays_o, rays_d, pixels = _setup(n_rays)
    mesh = make_hybrid_mesh(jax.devices()[:8], hosts=2)
    assert mesh.axis_names == ("hosts", "chips")
    assert mesh.devices.shape == (2, 4)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    step = make_parallel_train_step(
        field, estimator, tx, mesh,
        render_step_size=2e-2, near_plane=0.5, far_plane=4.0,
        sample_capacity_per_shard=512,
    )
    params_r = replicate(params, mesh)
    opt_r = replicate(opt_state, mesh)
    occ_r = replicate(occ_state, mesh)
    # per-host input pipeline entry (single-process here: whole batch local)
    ro, rd, px = host_local_rays_to_global(mesh, (rays_o, rays_d, pixels))
    assert len(ro.sharding.device_set) == 8

    key = jax.random.PRNGKey(1)
    p1, o1, loss1, n1 = step(
        params_r, opt_r, occ_r, ro, rd, px, jnp.ones(3), key
    )
    p2, o2, loss2, n2 = step(p1, o1, occ_r, ro, rd, px, jnp.ones(3), key)
    assert np.isfinite(float(loss1)) and float(loss2) < float(loss1)
    assert int(n1) > 0
    leaf = jax.tree.leaves(p1)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_process_local_batch_size():
    from nerfacc_tpu.parallel import process_local_batch_size

    assert process_local_batch_size(4096) == 4096  # single process
