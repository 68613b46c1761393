"""BARF family: SE(3) map, annealed PE, differentiable ray generation.

Oracles: group identities for the SE(3) exponential; the round-1
SinusoidalEncoder as the alpha=1 anchor; the numpy ray generator
(datasets/utils.py) as the ray oracle.  Reference capability anchor:
the BARF benchmark plug-in (``.gitmodules:10-13``)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.datasets.utils import generate_rays
from nerfacc_tpu.models.barf import (
    AnnealedSinusoidalEncoder,
    BARFRadianceField,
    PoseRefine,
    compose_pose,
    rays_from_pixels,
    se3_exp,
)
from nerfacc_tpu.models.mlp import SinusoidalEncoder


def _to44(m34):
    pad = np.tile(np.asarray([[0, 0, 0, 1.0]]), (m34.shape[0], 1, 1))
    return np.concatenate([np.asarray(m34), pad], axis=1)


def test_se3_exp_identities():
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(0, 0.7, size=(32, 6)).astype(np.float32))
    T = se3_exp(xi)
    Tinv = se3_exp(-xi)
    prod = _to44(T) @ _to44(Tinv)
    np.testing.assert_allclose(
        prod, np.tile(np.eye(4), (32, 1, 1)), atol=1e-5
    )
    # identity at zero twist
    T0 = se3_exp(jnp.zeros((6,)))
    np.testing.assert_allclose(
        np.asarray(T0), np.eye(4)[:3], atol=1e-7
    )
    # rotations orthonormal
    R = np.asarray(T)[:, :, :3]
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5
    )
    # tiny twists hit the Taylor branch smoothly
    eps = se3_exp(jnp.full((6,), 1e-6))
    np.testing.assert_allclose(np.asarray(eps), np.eye(4)[:3], atol=1e-5)


def test_se3_exp_grad_finite_at_zero():
    """The Taylor/closed-form `where` must not leak NaN through the VJP at
    the zero twist (the init value of every pose delta)."""
    g = jax.grad(lambda xi: jnp.sum(se3_exp(xi) ** 2))(jnp.zeros((6,)))
    assert bool(jnp.all(jnp.isfinite(g)))
    g2 = jax.grad(lambda xi: jnp.sum(se3_exp(xi) ** 2))(
        jnp.full((6,), 1e-10)
    )
    assert bool(jnp.all(jnp.isfinite(g2)))


def test_compose_pose_matches_matmul():
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.normal(0, 0.5, size=(8, 6)).astype(np.float32))
    c2w = se3_exp(
        jnp.asarray(rng.normal(0, 0.5, size=(8, 6)).astype(np.float32))
    )
    got = compose_pose(se3_exp(xi), c2w)
    want = (_to44(se3_exp(xi)) @ _to44(c2w))[:, :3]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_annealed_encoder_endpoints():
    enc_a = AnnealedSinusoidalEncoder(3, 0, 6)
    enc_s = SinusoidalEncoder(3, 0, 6)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(64, 3)).astype(np.float32)
    )
    pa = enc_a.init(jax.random.PRNGKey(0), x, 1.0)
    ps = enc_s.init(jax.random.PRNGKey(0), x)
    full = enc_a.apply(pa, x, 1.0)
    ref = enc_s.apply(ps, x)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref), atol=1e-6)
    assert full.shape[-1] == enc_a.latent_dim
    # alpha=0: every frequency is windowed out, identity passes through
    zero = enc_a.apply(pa, x, 0.0)
    np.testing.assert_allclose(np.asarray(zero[:, :3]), np.asarray(x))
    np.testing.assert_allclose(np.asarray(zero[:, 3:]), 0.0, atol=1e-7)
    # intermediate alpha: low freqs on, high freqs off
    mid = np.asarray(enc_a.apply(pa, x, 0.5))
    assert np.abs(mid[:, 3 : 3 + 3]).max() > 0.01  # k=0 active
    np.testing.assert_allclose(mid[:, 3 + 5 * 3 : 3 + 6 * 3], 0.0, atol=1e-7)


def test_rays_from_pixels_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]], np.float32)
    c2w = np.asarray(
        se3_exp(jnp.asarray(rng.normal(0, 0.4, size=(6,)).astype(np.float32)))
    )
    x = rng.integers(0, 128, 200).astype(np.float32)
    y = rng.integers(0, 96, 200).astype(np.float32)
    want = generate_rays(x, y, K, c2w, opengl=True)
    o, d = rays_from_pixels(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(K),
        jnp.broadcast_to(jnp.asarray(c2w), (200, 3, 4)),
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(want.origins),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(want.viewdirs),
                               atol=1e-5)


def test_pose_gradients_flow():
    """A photometric-style loss must produce nonzero pose-delta grads."""
    poser = PoseRefine(n_cams=4)
    nominal = se3_exp(
        jnp.asarray(
            np.random.default_rng(4).normal(0, 0.3, (4, 6)).astype(np.float32)
        )
    )
    pp = poser.init(
        jax.random.PRNGKey(0), jnp.zeros((4,), jnp.int32), nominal
    )
    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    cam_ids = jnp.asarray([0, 1, 2, 3])
    px = jnp.asarray([5.0, 10.0, 20.0, 30.0])
    py = jnp.asarray([6.0, 12.0, 24.0, 31.0])

    def loss(p):
        c2w = poser.apply(p, cam_ids, nominal[cam_ids])
        o, d = rays_from_pixels(px, py, K, c2w)
        target = o + 2.0 * d
        return jnp.sum((target - jnp.ones(3)) ** 2)

    g = jax.grad(loss)(pp)["params"]["pose_deltas"]
    assert float(jnp.abs(g).sum()) > 0.0
    assert g.shape == (4, 6)


def test_barf_field_annealed_density():
    field = BARFRadianceField(net_depth=2, net_width=32,
                              net_width_condition=16)
    x = jnp.zeros((8, 3))
    d = jnp.ones((8, 3)) / np.sqrt(3.0)
    params = field.init(jax.random.PRNGKey(0), x, d)
    rgb, sigma = field.apply(params, x, d, 0.3)
    assert rgb.shape == (8, 3) and sigma.shape == (8, 1)
    s0 = field.apply(params, x, 0.0, method="query_density")
    s1 = field.apply(params, x, 1.0, method="query_density")
    assert s0.shape == s1.shape == (8, 1)
