"""Port of tests/test_rendering.py — golden values and golden gradients
(the cross-framework conformance anchors, test_rendering.py:110-193)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.volrend import (
    accumulate_along_rays,
    render_transmittance_from_density,
    render_visibility_from_alpha,
    render_weight_from_alpha,
    render_weight_from_density,
    rendering,
)

RAY_INDICES = jnp.asarray([0, 2, 2, 2, 2], jnp.int32)
PACKED_INFO = jnp.asarray([[0, 1], [1, 0], [1, 4]], jnp.int32)


def test_render_visibility():
    alphas = jnp.asarray([0.4, 0.3, 0.8, 0.8, 0.5])
    # transmittance: [1.0, 1.0, 0.7, 0.14, 0.028]
    vis = render_visibility_from_alpha(
        alphas, ray_indices=RAY_INDICES, early_stop_eps=0.03, alpha_thre=0.0
    )
    np.testing.assert_array_equal(vis, [True, True, True, True, False])

    vis = render_visibility_from_alpha(
        alphas, ray_indices=RAY_INDICES, early_stop_eps=0.05, alpha_thre=0.35
    )
    np.testing.assert_array_equal(vis, [True, False, True, True, False])


def test_render_weight_from_alpha():
    alphas = jnp.asarray([0.4, 0.3, 0.8, 0.8, 0.5])
    weights, _ = render_weight_from_alpha(
        alphas, ray_indices=RAY_INDICES, n_rays=3
    )
    np.testing.assert_allclose(
        weights,
        [1.0 * 0.4, 1.0 * 0.3, 0.7 * 0.8, 0.14 * 0.8, 0.028 * 0.5],
        rtol=1e-6,
    )


def test_render_weight_from_density_matches_alpha():
    rng = np.random.default_rng(0)
    sigmas = jnp.asarray(rng.random(5, dtype=np.float32))
    t_starts = jnp.asarray(rng.random(5, dtype=np.float32))
    t_ends = t_starts + jnp.asarray(rng.random(5, dtype=np.float32)) + 1.0
    alphas = 1.0 - jnp.exp(-sigmas * (t_ends - t_starts))

    weights, _, _ = render_weight_from_density(
        t_starts, t_ends, sigmas, ray_indices=RAY_INDICES, n_rays=3
    )
    weights_tgt, _ = render_weight_from_alpha(
        alphas, ray_indices=RAY_INDICES, n_rays=3
    )
    np.testing.assert_allclose(weights, weights_tgt, atol=1e-6)


def test_accumulate_along_rays():
    weights = jnp.asarray([0.4, 0.3, 0.8, 0.8, 0.5])
    values = jnp.asarray(
        np.random.default_rng(1).random((5, 2), dtype=np.float32)
    )
    out = accumulate_along_rays(
        weights, values=values, ray_indices=RAY_INDICES, n_rays=3
    )
    assert out.shape == (3, 2)
    np.testing.assert_allclose(out[0], weights[0] * values[0], rtol=1e-6)
    np.testing.assert_array_equal(out[1], [0, 0])
    np.testing.assert_allclose(
        out[2], (weights[1:, None] * values[1:]).sum(axis=0), rtol=1e-6
    )


def test_accumulate_sorted_gather_backward():
    """The scatter-free segment-sum VJP (``_accumulate_sorted_g``) matches
    autodiff through the cumsum form — forward and gradient — including
    garbage ray indices at padding slots."""
    from nerfacc_tpu import volrend as vr

    rng = np.random.default_rng(3)
    n_rays, cap = 16, 128
    counts = rng.integers(0, 9, n_rays).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    ray_idx = np.full(cap, n_rays + 5, np.int32)
    valid = np.zeros(cap, bool)
    for r in range(n_rays):
        ray_idx[starts[r] : starts[r] + counts[r]] = r
        valid[starts[r] : starts[r] + counts[r]] = True
    src = rng.standard_normal((cap, 5)).astype(np.float32)
    src[~valid] = 0.0
    S, C, RI, V = map(jnp.asarray, (starts, counts, ray_idx, valid))
    srcj = jnp.asarray(src)

    f_ref = lambda s: jnp.sum(jnp.sin(vr._accumulate_sorted(s, S, C)))
    f_g = lambda s: jnp.sum(jnp.sin(vr._accumulate_sorted_g(s, S, C, RI, V)))
    np.testing.assert_allclose(f_ref(srcj), f_g(srcj), rtol=1e-6)
    np.testing.assert_allclose(
        jax.grad(f_ref)(srcj), jax.grad(f_g)(srcj), atol=1e-5
    )


def test_golden_grads():
    """The reference's hard-coded golden weights/gradients, checked across
    all equivalent formulations (test_rendering.py:110-193)."""
    sigmas = jnp.asarray([0.4, 0.8, 0.1, 0.8, 0.1])
    t_starts = jnp.asarray(
        np.random.default_rng(2).random(5, dtype=np.float32)
    )
    t_ends = t_starts + 1.0

    weights_ref = np.array([0.3297, 0.5507, 0.0428, 0.2239, 0.0174])
    sigmas_grad_ref = np.array([0.6703, 0.1653, 0.1653, 0.1653, 0.1653])

    def check(fn):
        w = fn(sigmas)
        g = jax.grad(lambda s: fn(s).sum())(sigmas)
        np.testing.assert_allclose(weights_ref, w, atol=1e-4)
        np.testing.assert_allclose(sigmas_grad_ref, g, atol=1e-4)

    def naive_ray_indices(s):
        trans, _ = render_transmittance_from_density(
            t_starts, t_ends, s, ray_indices=RAY_INDICES, n_rays=3
        )
        return trans * (1.0 - jnp.exp(-s * (t_ends - t_starts)))

    def naive_packed(s):
        trans, _ = render_transmittance_from_density(
            t_starts, t_ends, s, packed_info=PACKED_INFO, n_rays=3
        )
        return trans * (1.0 - jnp.exp(-s * (t_ends - t_starts)))

    def weight_density_ri(s):
        w, _, _ = render_weight_from_density(
            t_starts, t_ends, s, ray_indices=RAY_INDICES, n_rays=3
        )
        return w

    def weight_density_packed(s):
        w, _, _ = render_weight_from_density(
            t_starts, t_ends, s, packed_info=PACKED_INFO, n_rays=3
        )
        return w

    def weight_alpha_ri(s):
        alphas = 1.0 - jnp.exp(-s * (t_ends - t_starts))
        w, _ = render_weight_from_alpha(
            alphas, ray_indices=RAY_INDICES, n_rays=3
        )
        return w

    def weight_alpha_packed(s):
        alphas = 1.0 - jnp.exp(-s * (t_ends - t_starts))
        w, _ = render_weight_from_alpha(
            alphas, packed_info=PACKED_INFO, n_rays=3
        )
        return w

    for fn in [
        naive_ray_indices,
        naive_packed,
        weight_density_ri,
        weight_density_packed,
        weight_alpha_ri,
        weight_alpha_packed,
    ]:
        check(fn)


def test_rendering_shapes():
    def rgb_sigma_fn(t_starts, t_ends, ray_indices):
        return jnp.stack([t_starts] * 3, axis=-1), t_starts

    rng = np.random.default_rng(3)
    t_starts = jnp.asarray(rng.random(5, dtype=np.float32))
    t_ends = t_starts + 1.0

    colors, opacities, depths, extras = rendering(
        t_starts,
        t_ends,
        ray_indices=RAY_INDICES,
        n_rays=3,
        rgb_sigma_fn=rgb_sigma_fn,
    )
    assert colors.shape == (3, 3)
    assert opacities.shape == (3, 1)
    assert depths.shape == (3, 1)
    assert set(extras) >= {"weights", "alphas", "trans"}


def test_rendering_batched_vs_flat():
    """Batched (n_rays, n_samples) and flat row-major layouts must agree."""
    rng = np.random.default_rng(4)
    n_rays, n = 4, 16
    t_starts2 = jnp.asarray(
        np.sort(rng.random((n_rays, n), dtype=np.float32), axis=-1)
    )
    t_ends2 = t_starts2 + 0.05
    sig2 = jnp.asarray(rng.random((n_rays, n), dtype=np.float32))
    rgb2 = jnp.asarray(rng.random((n_rays, n, 3), dtype=np.float32))

    def fn_batched(ts, te, ri):
        return rgb2, sig2

    def fn_flat(ts, te, ri):
        return rgb2.reshape(-1, 3), sig2.reshape(-1)

    c_b, o_b, d_b, _ = rendering(
        t_starts2, t_ends2, rgb_sigma_fn=fn_batched
    )
    ray_indices = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), n)
    c_f, o_f, d_f, _ = rendering(
        t_starts2.reshape(-1),
        t_ends2.reshape(-1),
        ray_indices=ray_indices,
        n_rays=n_rays,
        rgb_sigma_fn=fn_flat,
    )
    np.testing.assert_allclose(c_b, c_f, atol=1e-5)
    np.testing.assert_allclose(o_b, o_f, atol=1e-5)
    np.testing.assert_allclose(d_b, d_f, atol=1e-5)


def test_prefix_trans_resumption():
    """Chunked marching with prefix_trans must equal one-shot rendering
    (the reference's resumable-transmittance contract, volrend.py:204-205)."""
    rng = np.random.default_rng(5)
    n_rays, n = 3, 20
    t = jnp.asarray(
        np.sort(rng.random((n_rays, n + 1), dtype=np.float32), axis=-1)
    )
    t_starts, t_ends = t[:, :-1], t[:, 1:]
    sigmas = jnp.asarray(rng.random((n_rays, n), dtype=np.float32) * 5)

    w_full, trans_full, _ = render_weight_from_density(t_starts, t_ends, sigmas)

    half = n // 2
    w1, trans1, _ = render_weight_from_density(
        t_starts[:, :half], t_ends[:, :half], sigmas[:, :half]
    )
    # Resume: prefix is the transmittance *after* the first chunk.
    alphas1 = 1 - jnp.exp(
        -sigmas[:, :half] * (t_ends[:, :half] - t_starts[:, :half])
    )
    prefix = trans1[:, -1:] * (1 - alphas1[:, -1:])
    w2, _, _ = render_weight_from_density(
        t_starts[:, half:],
        t_ends[:, half:],
        sigmas[:, half:],
        prefix_trans=jnp.broadcast_to(prefix, (n_rays, n - half)),
    )
    np.testing.assert_allclose(
        jnp.concatenate([w1, w2], axis=-1), w_full, atol=1e-5
    )


def test_rendering_alpha_path():
    """rgb_alpha_fn path (volrend.py:115-137): weights from exclusive_prod,
    must equal the density path when alpha = 1-exp(-sigma*dt)."""
    rng = np.random.default_rng(6)
    t_starts = jnp.asarray(rng.random(5, dtype=np.float32))
    t_ends = t_starts + 0.5
    sigmas = jnp.asarray(rng.random(5, dtype=np.float32) * 3)
    alphas = 1.0 - jnp.exp(-sigmas * (t_ends - t_starts))
    rgbs = jnp.asarray(rng.random((5, 3), dtype=np.float32))

    def rgb_sigma_fn(ts, te, ri):
        return rgbs, sigmas

    def rgb_alpha_fn(ts, te, ri):
        return rgbs, alphas

    out_d = rendering(
        t_starts, t_ends, ray_indices=RAY_INDICES, n_rays=3,
        rgb_sigma_fn=rgb_sigma_fn, render_bkgd=jnp.ones(3),
    )
    out_a = rendering(
        t_starts, t_ends, ray_indices=RAY_INDICES, n_rays=3,
        rgb_alpha_fn=rgb_alpha_fn, render_bkgd=jnp.ones(3),
    )
    for a, b in zip(out_d[:3], out_a[:3]):
        np.testing.assert_allclose(a, b, atol=1e-5)
    assert "sigmas" in out_d[3] and "alphas" in out_a[3]


def test_rendering_alpha_path_masks_invalid():
    """is_valid must zero alphas in the alpha path (invalid slots can carry
    arbitrary user alphas, unlike the density path's dt=0 no-ops)."""
    t_starts = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    t_ends = t_starts + 0.1
    ray_indices = jnp.asarray([0, 0, 1, 1], jnp.int32)
    is_valid = jnp.asarray([True, False, True, False])

    def rgb_alpha_fn(ts, te, ri):
        return jnp.ones((4, 3)) * 0.5, jnp.full((4,), 0.9)

    _, opac, _, _ = rendering(
        t_starts, t_ends, ray_indices=ray_indices, n_rays=2,
        rgb_alpha_fn=rgb_alpha_fn, is_valid=is_valid,
    )
    np.testing.assert_allclose(opac[:, 0], [0.9, 0.9], atol=1e-6)
