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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_propnet_train_step():
    """PropNet pipeline under sharding (VERDICT r2 #6): the two-optimizer
    flattened flow trains, loss is finite/improving, and both parameter
    sets stay replicated after the psum'd update."""
    from nerfacc_tpu.estimators.prop_net import PropNetEstimator
    from nerfacc_tpu.models.ngp import NGPDensityField
    from nerfacc_tpu.parallel import (
        make_parallel_propnet_train_step,
        replicate,
        shard_rays,
    )

    n_rays = 32
    aabb = [-1, -1, -1, 1, 1, 1]
    field = NGPRadianceField(
        aabb=aabb, n_levels=4, log2_hashmap_size=12, max_resolution=64
    )
    fp = field.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    prop_nets = [
        NGPDensityField(
            aabb=aabb, n_levels=3, log2_hashmap_size=10, max_resolution=32
        )
    ]
    pp = tuple(
        net.init(jax.random.PRNGKey(i + 1), jnp.zeros((8, 3)))
        for i, net in enumerate(prop_nets)
    )
    estimator = PropNetEstimator()
    tx_f, tx_p = optax.adam(1e-2), optax.adam(1e-2)
    opt_f, opt_p = tx_f.init(fp), tx_p.init(pp)

    mesh = make_mesh(jax.devices()[:8])
    step = make_parallel_propnet_train_step(
        field, prop_nets, estimator, tx_f, tx_p, mesh,
        num_samples=8, prop_samples=(16,), near_plane=0.5, far_plane=4.0,
    )

    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = shard_rays(jnp.asarray(-2.0 * d), mesh)
    rd = shard_rays(jnp.asarray(d), mesh)
    px = shard_rays(jnp.asarray(rng.random((n_rays, 3), dtype=np.float32)), mesh)
    fp_r, pp_r = replicate(fp, mesh), replicate(pp, mesh)
    opt_f_r, opt_p_r = replicate(opt_f, mesh), replicate(opt_p, mesh)

    key = jax.random.PRNGKey(2)
    fp1, pp1, of1, op1, loss1, mse1, pl1 = step(
        fp_r, pp_r, opt_f_r, opt_p_r, ro, rd, px, jnp.ones(3), key,
        requires_grad=True,
    )
    fp2, pp2, of2, op2, loss2, mse2, pl2 = step(
        fp1, pp1, of1, op1, ro, rd, px, jnp.ones(3), key,
        requires_grad=True,
    )
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(mse2) < float(mse1)  # same batch twice must improve
    for tree in (fp1, pp1):
        leaf = jax.tree.leaves(tree)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
    # the requires_grad=False variant must leave prop params untouched
    fp3, pp3, *_ = step(
        fp2, pp2, of2, op2, ro, rd, px, jnp.ones(3), key,
        requires_grad=False,
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(pp3)[0]), np.asarray(jax.tree.leaves(pp2)[0])
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_test_renderer_matches_single_chip():
    """The sharded iterative alive-ray renderer (VERDICT r2 #6) must match
    the single-device test renderer's output on the same rays."""
    from nerfacc_tpu.parallel import make_parallel_test_renderer, replicate
    from nerfacc_tpu.rendering import occgrid_render_rays_test

    n_rays = 32
    field, estimator, occ_state, params, rays_o, rays_d, _ = _setup(n_rays)
    mesh = make_mesh(jax.devices()[:8])

    render = make_parallel_test_renderer(
        field, estimator, mesh,
        render_step_size=2e-2, near_plane=0.5, far_plane=4.0,
        samples_per_round=16, max_samples=256,
    )
    params_r = replicate(params, mesh)
    occ_r = replicate(occ_state, mesh)
    from nerfacc_tpu.parallel import shard_rays

    ro, rd = shard_rays(rays_o, mesh), shard_rays(rays_d, mesh)
    rgb_p, opa_p, dep_p, n_rounds = render(
        params_r, occ_r, ro, rd, render_bkgd=jnp.ones(3)
    )
    assert n_rounds >= 1

    def builder(rays_o, rays_d):
        def fn(ts, te, ri):
            x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
            rgb, sigma = field.apply(params, x, rays_d[ri])
            return rgb, sigma[..., 0]

        return fn

    rgb_s, opa_s, dep_s, _ = occgrid_render_rays_test(
        builder, estimator, occ_state, rays_o, rays_d,
        render_step_size=2e-2, near_plane=0.5, far_plane=4.0,
        samples_per_round=16, max_samples=256,
        render_bkgd=jnp.ones(3),
    )
    np.testing.assert_allclose(
        np.asarray(rgb_p), np.asarray(rgb_s), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(opa_p), np.asarray(opa_s), atol=2e-3
    )


def test_two_process_distributed():
    """Real 2-process jax.distributed run on CPU (VERDICT r2 #6): the
    multi-process branches of make_hybrid_mesh / host_local_rays_to_global
    execute, and both processes compute IDENTICAL losses — proof the
    gradient psum reduced across the process (DCN) axis."""
    import os
    import pathlib
    import re
    import socket
    import subprocess
    import sys

    worker = pathlib.Path(__file__).parent / "distributed_worker.py"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    losses = []
    for out in outs:
        m = re.search(r"DIST_OK pid=\d+ loss1=([\d.]+) loss2=([\d.]+)", out)
        assert m, out[-2000:]
        losses.append((m.group(1), m.group(2)))
    assert losses[0] == losses[1], losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_train_step_grouped_encoder():
    """The grouped tcnn-shape encoder (flagship candidate) under the
    sharded data-parallel train step: its positional factor kernel's
    backward must compose with shard_map + psum grads."""
    n_rays = 64
    _, estimator, occ_state, _, rays_o, rays_d, pixels = _setup(n_rays)
    aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
    field = NGPRadianceField(
        aabb=aabb, encoder_type="grouped", n_levels=16,
        n_features_per_level=2, log2_hashmap_size=12, max_resolution=64,
        compute_dtype=jnp.bfloat16,
    )
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    mesh = make_mesh(jax.devices()[:8])
    tx = optax.adam(1e-2)
    step = make_parallel_train_step(
        field, estimator, tx, mesh,
        render_step_size=2e-2, near_plane=0.5, far_plane=4.0,
        sample_capacity_per_shard=512,
    )
    params_r = replicate(params, mesh)
    opt_r = replicate(tx.init(params), mesh)
    occ_r = replicate(occ_state, mesh)
    ro, rd, px = (shard_rays(a, mesh) for a in (rays_o, rays_d, pixels))
    key = jax.random.PRNGKey(1)
    p1, o1, loss1, n1 = step(
        params_r, opt_r, occ_r, ro, rd, px, jnp.ones(3), key
    )
    p2, _, loss2, _ = step(p1, o1, occ_r, ro, rd, px, jnp.ones(3), key)
    assert np.isfinite(float(loss1)) and float(loss2) < float(loss1)
    assert int(n1) > 0
    leaf = jax.tree.leaves(p1)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
