"""Render-driver tests: train-mode vs test-mode equivalence (the analogue of
tests/test_grid.py:72-131 at the full-renderer level) and propnet driver."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.estimators.prop_net import PropNetEstimator
from nerfacc_tpu.rendering import (
    occgrid_render_rays,
    occgrid_render_rays_test,
    propnet_render_rays,
)


def _scene():
    def sigma_at(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 8.0, 0.0)

    def rgb_at(x):
        return jax.nn.sigmoid(x * 3.0)

    return sigma_at, rgb_at


def _setup(n_rays=64, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-2.0 * d)
    rays_d = jnp.asarray(d)

    estimator = OccGridEstimator(
        roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=32, levels=1
    )
    state = estimator.init()
    sigma_at, rgb_at = _scene()
    # occupancy from the analytic scene
    key = jax.random.PRNGKey(0)
    state = estimator.update_every_n_steps(
        state, 0, lambda x: sigma_at(x) * 0.02, key
    )
    return estimator, state, rays_o, rays_d, sigma_at, rgb_at


def _fn_builder(sigma_at, rgb_at):
    def builder(rays_o, rays_d):
        def rgb_sigma_fn(ts, te, ri):
            x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
            return rgb_at(x), sigma_at(x)

        return rgb_sigma_fn

    return builder


def test_train_vs_test_mode_renderers_agree():
    estimator, state, rays_o, rays_d, sigma_at, rgb_at = _setup()
    builder = _fn_builder(sigma_at, rgb_at)

    bkgd = jnp.ones(3)
    colors, opac, depth, n_samp, _ = occgrid_render_rays(
        builder(rays_o, rays_d),
        None,
        estimator,
        state,
        rays_o,
        rays_d,
        near_plane=0.5,
        far_plane=4.0,
        render_step_size=2e-2,
        render_bkgd=bkgd,
        sample_capacity=64 * 256,
    )

    colors2, opac2, depth2, total = occgrid_render_rays_test(
        builder,
        estimator,
        state,
        rays_o,
        rays_d,
        max_samples=2048,
        samples_per_round=16,
        near_plane=0.5,
        far_plane=4.0,
        render_step_size=2e-2,
        render_bkgd=bkgd,
        early_stop_eps=1e-6,  # effectively no early stop for exactness
    )
    assert total > 0
    np.testing.assert_allclose(colors, colors2, atol=2e-3)
    np.testing.assert_allclose(opac, opac2, atol=2e-3)
    # depth only meaningful where something was hit
    hit = np.asarray(opac[:, 0]) > 0.1
    np.testing.assert_allclose(
        np.asarray(depth)[hit], np.asarray(depth2)[hit], atol=5e-2
    )


def test_test_mode_early_stop_saves_samples():
    estimator, state, rays_o, rays_d, sigma_at, rgb_at = _setup()
    builder = _fn_builder(sigma_at, rgb_at)
    kw = dict(
        max_samples=2048,
        samples_per_round=16,
        near_plane=0.5,
        far_plane=4.0,
        render_step_size=2e-2,
        render_bkgd=jnp.ones(3),
    )
    _, _, _, total_eager = occgrid_render_rays_test(
        builder, estimator, state, rays_o, rays_d,
        early_stop_eps=1e-2, **kw,
    )
    _, _, _, total_full = occgrid_render_rays_test(
        builder, estimator, state, rays_o, rays_d,
        early_stop_eps=1e-8, **kw,
    )
    assert total_eager < total_full


def test_propnet_driver():
    rng = np.random.default_rng(0)
    n_rays = 32
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-2.0 * d)
    rays_d = jnp.asarray(d)
    sigma_at, rgb_at = _scene()

    def prop_fn(ts, te):
        x = rays_o[:, None] + ((ts + te) / 2)[..., None] * rays_d[:, None]
        return sigma_at(x)

    def rgb_sigma_fn(ts, te):
        x = rays_o[:, None] + ((ts + te) / 2)[..., None] * rays_d[:, None]
        return rgb_at(x), sigma_at(x)

    colors, opac, depth, extras = propnet_render_rays(
        rgb_sigma_fn,
        [prop_fn],
        PropNetEstimator(),
        rays_o,
        rays_d,
        num_samples=32,
        prop_samples=(64,),
        near_plane=0.5,
        far_plane=4.0,
        sampling_type="uniform",
        opaque_bkgd=False,
        render_bkgd=jnp.ones(3),
        requires_grad=True,
    )
    assert colors.shape == (n_rays, 3)
    assert len(extras["prop_cache"]) == 2
    # all rays hit the opaque ball
    assert float(opac.mean()) > 0.9


def test_estimator_api_matches_driver():
    """The reference-parity path (estimator.sampling + rendering) must agree
    with the fused perf driver (occgrid_render_rays) on the same scene."""
    from nerfacc_tpu.volrend import rendering

    estimator, state, rays_o, rays_d, sigma_at, rgb_at = _setup()
    n_rays = rays_o.shape[0]
    builder = _fn_builder(sigma_at, rgb_at)
    bkgd = jnp.ones(3)
    kw = dict(near_plane=0.5, far_plane=4.0, render_step_size=2e-2)

    ray_indices, t_starts, t_ends, is_valid = estimator.sampling(
        state, rays_o, rays_d, **kw
    )
    c_api, o_api, d_api, _ = rendering(
        t_starts,
        t_ends,
        ray_indices=ray_indices,
        n_rays=n_rays,
        rgb_sigma_fn=builder(rays_o, rays_d),
        render_bkgd=bkgd,
        is_valid=is_valid,
    )

    c_drv, o_drv, d_drv, n_samp, _ = occgrid_render_rays(
        builder(rays_o, rays_d),
        None,
        estimator,
        state,
        rays_o,
        rays_d,
        render_bkgd=bkgd,
        sample_capacity=n_rays * 256,
        **kw,
    )
    np.testing.assert_allclose(c_api, c_drv, atol=2e-3)
    np.testing.assert_allclose(o_api, o_drv, atol=2e-3)


def test_refilter_capacity_matches_mask_path():
    """Two-phase visibility refiltering (shrunk differentiable pass) must
    produce the same image as the in-place mask path."""
    estimator, state, rays_o, rays_d, sigma_at, rgb_at = _setup()
    builder = _fn_builder(sigma_at, rgb_at)

    def sigma_fn(ts, te, ri):
        x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
        return sigma_at(x)

    bkgd = jnp.ones(3)
    kw = dict(
        near_plane=0.5, far_plane=4.0, render_step_size=2e-2,
        alpha_thre=1e-3, early_stop_eps=1e-4,
        sample_capacity=64 * 256,
    )
    c1, o1, d1, n1, _ = occgrid_render_rays(
        builder(rays_o, rays_d), sigma_fn, estimator, state,
        rays_o, rays_d, render_bkgd=bkgd, **kw,
    )
    c2, o2, d2, n2, _ = occgrid_render_rays(
        builder(rays_o, rays_d), sigma_fn, estimator, state,
        rays_o, rays_d, render_bkgd=bkgd,
        refilter_capacity=64 * 64, **kw,
    )
    assert int(n2) <= int(n1)
    np.testing.assert_allclose(c1, c2, atol=2e-3)
    np.testing.assert_allclose(o1, o2, atol=2e-3)


def test_test_renderer_with_timestamps():
    """Dynamic-scene (dnerf-style) inference: the test renderer's builder
    closure carries per-ray timestamps; a time-dependent field renders
    consistently vs the train driver (reference capability:
    `examples/train_mlp_tnerf.py` eval with timestamps)."""
    estimator, state, rays_o, rays_d, sigma_at, rgb_at = _setup(n_rays=32)
    times = jnp.asarray(
        np.random.default_rng(3).random(32, dtype=np.float32)
    )

    def sigma_t(x, t):
        # time modulates the sphere radius
        r = 0.4 + 0.15 * t
        return jnp.where(jnp.linalg.norm(x, axis=-1) < r, 8.0, 0.0)

    def rgb_t(x, t):
        return jax.nn.sigmoid(x * 2.0 + t[..., None])

    def builder(ro, rd):
        def rgb_sigma_fn(ts, te, ri):
            x = ro[ri] + ((ts + te) / 2)[:, None] * rd[ri]
            t = times[ri]
            return rgb_t(x, t), sigma_t(x, t)

        return rgb_sigma_fn

    rgb_test, opa_test, _, n_s = occgrid_render_rays_test(
        builder, estimator, state, rays_o, rays_d,
        max_samples=256, samples_per_round=32,
        render_step_size=2e-2, render_bkgd=jnp.ones(3),
    )
    assert n_s > 0

    def sigma_fn(ts, te, ri):
        x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
        return sigma_t(x, times[ri])

    rgb_train, _, _, _, extras = occgrid_render_rays(
        builder(rays_o, rays_d), sigma_fn, estimator, state,
        rays_o, rays_d, render_step_size=2e-2,
        render_bkgd=jnp.ones(3), sample_capacity=32 * 256,
    )
    np.testing.assert_allclose(
        np.asarray(rgb_test), np.asarray(rgb_train), atol=5e-2
    )


def test_soa_carry_path_matches_array_path():
    """The SoA fast path (ray components carried through the compaction
    sort, field fed 1-D component arrays — rendering.py rgb_sigma_soa_fn)
    must be sample-for-sample identical to the reference array-path
    callbacks (capability anchor: same render as examples/utils.py:54-152).
    """
    estimator, state, rays_o, rays_d, sigma_at, rgb_at = _setup()

    def rgb_sigma_fn(ts, te, ri):
        x = rays_o[ri] + ((ts + te) / 2)[:, None] * rays_d[ri]
        return rgb_at(x), sigma_at(x)

    def soa_fn(o, d, ts, te):
        tm = (ts + te) * 0.5
        x = jnp.stack([o[k] + tm * d[k] for k in range(3)], axis=-1)
        return rgb_at(x), sigma_at(x)

    kw = dict(
        near_plane=0.0, far_plane=1e10, render_step_size=2e-2,
        render_bkgd=jnp.ones(3), sample_capacity=64 * 64,
        max_macro_segments=8,
    )
    c0, o0, d0, n0, _ = occgrid_render_rays(
        rgb_sigma_fn, None, estimator, state, rays_o, rays_d, **kw
    )
    c1, o1, d1, n1, _ = occgrid_render_rays(
        rgb_sigma_fn, None, estimator, state, rays_o, rays_d,
        rgb_sigma_soa_fn=soa_fn, **kw
    )
    assert int(n0) == int(n1)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
