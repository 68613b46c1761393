"""Model tests: encoder variants, NGP fields, MLP family, SH encoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.models.encoding import (
    HashGridEncoder,
    spherical_harmonics_deg4,
)
from nerfacc_tpu.models.hash_soa import (
    HashGridEncoderFolded,
    HashGridEncoderFused,
    HashGridEncoderSoA,
)
from nerfacc_tpu.models.mlp import (
    TNeRFRadianceField,
    VanillaNeRFRadianceField,
)
from nerfacc_tpu.models.ngp import (
    NGPDensityField,
    NGPRadianceField,
    contract_to_unisphere,
    trunc_exp,
)


def test_hash_encoders_agree_aos_vs_soa():
    """The SoA encoder must be numerically identical to the AoS parity
    encoder (same table layout semantics, reordered compute)."""
    kw = dict(n_levels=4, log2_hashmap_size=12, max_resolution=128)
    enc_a = HashGridEncoder(**kw)
    enc_s = HashGridEncoderSoA(**kw)
    x = jnp.asarray(np.random.default_rng(0).random((257, 3), dtype=np.float32))
    pa = enc_a.init(jax.random.PRNGKey(0), x[:8])
    ps = enc_s.init(jax.random.PRNGKey(0), x[:8])
    # Rearrange AoS table (LT, F) into SoA layout (F, LT) to share weights.
    t = pa["params"]["table"]
    ps = {"params": {"table": t.T}}
    np.testing.assert_allclose(
        enc_a.apply(pa, x), enc_s.apply(ps, x), rtol=1e-5, atol=1e-9
    )


def test_folded_ties_to_fused():
    """Summing the folded encoder's corner blocks must reproduce the fused
    encoder's trilinear interpolation exactly (same table)."""
    kw = dict(n_levels=3, n_features_per_level=4, log2_hashmap_size=11,
              max_resolution=128)
    enc_f = HashGridEncoderFused(**kw)
    enc_m = HashGridEncoderFolded(**kw)
    x = jnp.asarray(
        np.random.default_rng(5).random((193, 3), dtype=np.float32)
    )
    pf = enc_f.init(jax.random.PRNGKey(0), x[:8])
    pm = {"params": {"table": pf["params"]["table"]}}
    want = enc_f.apply(pf, x)  # (n, L*F)
    got = enc_m.apply(pm, x)  # (n, L*8F)
    L, F = 3, 4
    tied = got.reshape(x.shape[0], L, 8, F).sum(axis=2).reshape(
        x.shape[0], L * F
    )
    np.testing.assert_allclose(
        np.asarray(tied), np.asarray(want), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize(
    "enc_cls",
    [HashGridEncoder, HashGridEncoderSoA, HashGridEncoderFused,
     HashGridEncoderFolded],
)
def test_encoder_grads_flow(enc_cls):
    enc = enc_cls(n_levels=3, log2_hashmap_size=10, max_resolution=64)
    x = jnp.asarray(np.random.default_rng(1).random((65, 3), dtype=np.float32))
    p = enc.init(jax.random.PRNGKey(0), x[:8])
    out = enc.apply(p, x)
    assert out.shape == (65, enc.latent_dim)
    g = jax.grad(lambda pp: (enc.apply(pp, x) ** 2).sum())(p)
    table_g = g["params"]["table"]
    assert float(jnp.abs(table_g).sum()) > 0
    # position gradients too (trilinear weights are differentiable)
    gx = jax.grad(lambda xx: (enc.apply(p, xx) ** 2).sum())(x)
    assert np.isfinite(np.asarray(gx)).all()


def test_encoder_continuity_soa():
    """Shared-vertex encoders are continuous across cell boundaries."""
    enc = HashGridEncoderSoA(n_levels=2, log2_hashmap_size=14, max_resolution=32)
    p = enc.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)))
    eps = 1e-5
    # points straddling the x = 8/16 boundary of the coarse level
    x0 = jnp.asarray([[0.5 - eps, 0.3, 0.7]])
    x1 = jnp.asarray([[0.5 + eps, 0.3, 0.7]])
    d = np.abs(np.asarray(enc.apply(p, x0) - enc.apply(p, x1))).max()
    assert d < 1e-3


def test_trunc_exp_grad_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-6)


def test_contract_to_unisphere_range():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32) * 5
    )
    u = contract_to_unisphere(x, aabb)
    assert float(u.min()) >= 0.0 and float(u.max()) <= 1.0
    # points inside the aabb map linearly to [0.25, 0.75]
    xin = jnp.asarray([[0.5, -0.5, 0.0]])
    np.testing.assert_allclose(
        contract_to_unisphere(xin, aabb)[0], [0.625, 0.375, 0.5], atol=1e-6
    )


def test_sh_deg4_orthonormalish():
    """SH basis: constant term and value sanity on canonical directions."""
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    sh = spherical_harmonics_deg4(d)
    assert sh.shape == (1, 16)
    np.testing.assert_allclose(sh[0, 0], 0.28209479, rtol=1e-6)
    np.testing.assert_allclose(sh[0, 2], 0.48860251, rtol=1e-6)  # z term
    np.testing.assert_allclose(sh[0, 1], 0.0, atol=1e-7)  # y term


def test_ngp_field_selector_zeroes_outside():
    f = NGPRadianceField(
        aabb=[-1, -1, -1, 1, 1, 1], n_levels=3, log2_hashmap_size=10,
        max_resolution=64,
    )
    p = f.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    x_out = jnp.asarray([[2.0, 0.0, 0.0]])
    assert float(f.apply(p, x_out, method="query_density")[0, 0]) == 0.0
    x_in = jnp.asarray([[0.1, 0.0, 0.0]])
    assert float(f.apply(p, x_in, method="query_density")[0, 0]) > 0.0


def test_ngp_density_field():
    f = NGPDensityField(aabb=[-1, -1, -1, 1, 1, 1], n_levels=3,
                        log2_hashmap_size=10)
    p = f.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)))
    sig = f.apply(p, jnp.zeros((16, 3)))
    assert sig.shape == (16, 1)
    assert float(sig.min()) > 0


def test_vanilla_nerf_shapes():
    f = VanillaNeRFRadianceField(net_depth=2, net_width=32)
    x = jnp.zeros((16, 3))
    d = jnp.ones((16, 3))
    p = f.init(jax.random.PRNGKey(0), x, d)
    rgb, sigma = f.apply(p, x, d)
    assert rgb.shape == (16, 3) and sigma.shape == (16, 1)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1
    dens = f.apply(p, x, method="query_density")
    assert float(dens.min()) >= 0


def test_tnerf_time_dependence():
    f = TNeRFRadianceField()
    x = jnp.asarray(np.random.default_rng(0).random((8, 3), dtype=np.float32))
    t0 = jnp.zeros((8, 1))
    t1 = jnp.ones((8, 1))
    p = f.init(jax.random.PRNGKey(0), x, t0, x)
    d0 = f.apply(p, x, t0, method="query_density")
    d1 = f.apply(p, x, t1, method="query_density")
    # warp starts tiny (1e-4 init) so these are close but the net is valid
    assert d0.shape == (8, 1)
    assert np.isfinite(np.asarray(d1)).all()


def test_tensorf_field():
    from nerfacc_tpu.models.tensorf import TensoRFRadianceField

    f = TensoRFRadianceField(aabb=[-1, -1, -1, 1, 1, 1], resolution=32,
                             mlp_width=32)
    x = jnp.asarray(np.random.default_rng(0).random((16, 3), dtype=np.float32))
    d = jnp.ones((16, 3)) * 0.577
    p = f.init(jax.random.PRNGKey(0), x, d)
    rgb, sig = f.apply(p, x, d)
    assert rgb.shape == (16, 3) and sig.shape == (16, 1)
    assert float(sig.min()) >= 0
    # outside the aabb -> zero density
    assert float(f.apply(p, jnp.asarray([[3.0, 0, 0]]),
                         method="query_density")[0, 0]) == 0.0
    # grads flow into planes and lines
    g = jax.grad(lambda pp: f.apply(pp, x, d)[1].sum())(p)
    assert float(jnp.abs(g["params"]["dp0"]).sum()) > 0
    assert float(jnp.abs(g["params"]["dl0"]).sum()) > 0


def test_kplanes_field_dynamic():
    from nerfacc_tpu.models.tensorf import KPlanesRadianceField

    f = KPlanesRadianceField(aabb=[-1, -1, -1, 1, 1, 1], resolution=16,
                             dynamic=True, mlp_width=16)
    x = jnp.asarray(np.random.default_rng(0).random((8, 3), dtype=np.float32))
    t = jnp.full((8, 1), 0.3)
    d = jnp.ones((8, 3)) * 0.577
    p = f.init(jax.random.PRNGKey(0), x, t, d)
    rgb, sig = f.apply(p, x, t, d)
    assert rgb.shape == (8, 3) and sig.shape == (8, 1)
    # time dependence: different t changes density
    sig2 = f.apply(p, x, jnp.full((8, 1), 0.9), method="query_density")
    assert float(jnp.abs(sig - sig2).max()) > 0


def test_tineuvox_field():
    """TiNeuVox-style voxel+time field: shapes, time dependence, grads
    (reference capability: tineuvox benchmark plug-in, .gitmodules:15-18)."""
    from nerfacc_tpu.models.tineuvox import TiNeuVoxRadianceField

    field = TiNeuVoxRadianceField(
        aabb=(-1, -1, -1, 1, 1, 1), resolution=16, net_width=16
    )
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-0.8, 0.8, (33, 3)).astype(np.float32)
    )
    d = jnp.ones((33, 3)) / np.sqrt(3.0)
    t0 = jnp.zeros((33, 1))
    t1 = jnp.ones((33, 1)) * 0.7
    params = field.init(jax.random.PRNGKey(0), x, t0, d)
    rgb, sigma = field.apply(params, x, t0, d)
    assert rgb.shape == (33, 3) and sigma.shape == (33, 1)
    assert np.isfinite(np.asarray(rgb)).all()
    # the deformation net must make density time-dependent
    s0 = np.asarray(field.apply(params, x, t0, method="query_density"))
    s1 = np.asarray(field.apply(params, x, t1, method="query_density"))
    assert not np.allclose(s0, s1)
    # opacity probe used by the occ estimator
    op = field.apply(params, x, t0, 1e-2, method="query_opacity")
    assert op.shape == (33, 1)
    g = jax.grad(
        lambda p: float_loss(field, p, x, t1, d)
    )(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def float_loss(field, p, x, t, d):
    rgb, sigma = field.apply(p, x, t, d)
    return (rgb**2).sum() + (sigma**2).sum()


def test_contract_tanh_roundtrip():
    """UN_BOUNDED_TANH contraction (utils_contraction.cuh:33-61): range,
    roi image, and inverse round-trip."""
    from nerfacc_tpu.models.ngp import contract_tanh, contract_tanh_inv

    aabb = jnp.asarray([-1.0, -2.0, -1.0, 1.0, 2.0, 3.0])
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32) * 4
    )
    u = contract_tanh(x, aabb)
    assert float(u.min()) > 0.0 and float(u.max()) < 1.0
    # roi corners map to tanh(+-0.5)/2 + 0.5
    lo = contract_tanh(aabb[:3][None], aabb)
    hi = contract_tanh(aabb[3:][None], aabb)
    np.testing.assert_allclose(
        np.asarray(lo)[0], [0.5 - np.tanh(0.5) / 2] * 3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hi)[0], [0.5 + np.tanh(0.5) / 2] * 3, atol=1e-6
    )
    # round-trip where tanh hasn't saturated in f32 (|unit coord| < 3)
    xm = jnp.asarray(
        np.random.default_rng(1).uniform(-1.5, 1.5, (500, 3)).astype(
            np.float32
        )
    )
    back = contract_tanh_inv(contract_tanh(xm, aabb), aabb)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xm), rtol=1e-3,
                               atol=1e-3)


def test_fused_paired_levels_lerp():
    """Chunk-paired coarse encoding (endpoint-feature lerp): unpaired levels
    bit-exact, chunk endpoints exact, interior samples secant-close for
    chunks inside one cell / bounded by the feature scale for straddling
    chunks, and a misaligned batch silently falls back to the exact path."""
    from nerfacc_tpu.models.hash_soa import (
        grid_resolutions,
        paired_safe_level_count,
    )

    F, C, step = 8, 4, 1e-3
    enc = HashGridEncoderFused(
        n_levels=4, n_features_per_level=F, log2_hashmap_size=12,
        max_resolution=1024,
    )
    rng = np.random.default_rng(3)
    o = rng.uniform(0.3, 0.7, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = step * np.arange(C, dtype=np.float32)
    x = jnp.asarray(
        (o[:, None, :] + t[None, :, None] * d[:, None, :]).reshape(-1, 3)
    )
    params = enc.init(jax.random.PRNGKey(0), x[:8])

    res = grid_resolutions(4, 16, 1024)
    P = paired_safe_level_count(res, step * C, chunk=1, margin=2.0)
    assert P >= 1

    y0 = np.asarray(enc.apply(params, x, paired_levels=0))
    yp = np.asarray(enc.apply(params, x, paired_levels=P))
    # Unpaired levels bit-exact.
    np.testing.assert_array_equal(y0[:, P * F:], yp[:, P * F:])
    # Chunk endpoints exact (they ARE the gathered points).
    ends = np.zeros(x.shape[0], bool)
    ends[0::C] = True
    ends[C - 1 :: C] = True
    np.testing.assert_allclose(
        y0[ends, : P * F], yp[ends, : P * F], atol=1e-7
    )
    # Interior error: secant-tiny for chunks inside one cell; bounded by
    # the feature scale for the small fraction of chunks straddling a cell
    # boundary (the corner-fused layout is discontinuous across cells).
    err = np.abs(y0[:, : P * F] - yp[:, : P * F])
    scale = np.abs(y0[:, : P * F]).max()
    assert np.quantile(err, 0.9) < 0.02 * scale
    assert err.max() < 4.0 * scale

    # Misaligned batch (n % C != 0) -> exact fallback.
    y_mis = np.asarray(enc.apply(params, x[:-1], paired_levels=P))
    np.testing.assert_array_equal(y_mis, y0[:-1])

    # Gradients flow into the table through the paired path.
    def loss(p):
        return (enc.apply(p, x, paired_levels=P) ** 2).sum()

    g = jax.grad(loss)(params)["params"]["table"]
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_ngp_compute_dtype_bf16():
    """bf16 compute path: f32 params/outputs, close to the f32 path, healthy
    gradients (the bench's mixed-precision mode, tcnn-fp16 numerics class)."""
    from nerfacc_tpu.models.ngp import NGPRadianceField

    aabb = [-1.5] * 3 + [1.5] * 3
    kw = dict(aabb=aabb, encoder_type="fused", n_levels=4,
              n_features_per_level=16, log2_hashmap_size=15)
    f32 = NGPRadianceField(**kw)
    bf = NGPRadianceField(**kw, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2048, 3)).astype(np.float32))
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    params = f32.init(jax.random.PRNGKey(0), x[:8], d[:8])

    rgb0, s0 = f32.apply(params, x, d)
    rgb1, s1 = bf.apply(params, x, d)
    assert rgb1.dtype == jnp.float32 and s1.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), atol=3e-2)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s0),
        rtol=3e-2, atol=1e-3 * float(jnp.abs(s0).max()),
    )

    def loss(pp, field):
        r, s = field.apply(pp, x, d)
        return r.sum() + s.sum()

    g0 = jax.grad(loss)(params, f32)["params"]["encoder"]["table"]
    g1 = jax.grad(loss)(params, bf)["params"]["encoder"]["table"]
    assert g1.dtype == jnp.float32
    assert np.isfinite(np.asarray(g1)).all()
    corr = float(
        (g0.ravel() @ g1.ravel())
        / (jnp.linalg.norm(g0) * jnp.linalg.norm(g1) + 1e-12)
    )
    assert corr > 0.98, corr


def test_ngp_soa_query_matches_array_path():
    """SoA (component-tuple) field inputs + chunked ray gathers reproduce
    the (n, 3)-array path exactly (bounded and unbounded contraction)."""
    from nerfacc_tpu.models.ngp import NGPRadianceField
    from nerfacc_tpu.rendering import chunked_ray_components

    aabb = [-1.5] * 3 + [1.5] * 3
    field = NGPRadianceField(aabb=aabb, encoder_type="fused", n_levels=4,
                             n_features_per_level=16, log2_hashmap_size=15)
    rng = np.random.default_rng(0)
    n_rays, n = 64, 64 * 8
    ri = jnp.asarray(np.repeat(np.arange(n_rays, dtype=np.int32), 8))
    ro = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ts = jnp.asarray(rng.random(n).astype(np.float32))
    te = ts + 5e-3
    rays_o, rays_d = jnp.asarray(ro), jnp.asarray(rd)
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )

    mid = (ts + te) / 2
    x = rays_o[ri] + mid[:, None] * rays_d[ri]
    rgb0, s0 = field.apply(params, x, rays_d[ri])

    (ox, oy, oz), (dx, dy, dz) = chunked_ray_components(rays_o, rays_d, ri)
    xs = (ox + mid * dx, oy + mid * dy, oz + mid * dz)
    rgb1, s1 = field.apply(params, xs, (dx, dy, dz))
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-6
    )

    # Misaligned batch -> per-sample fallback, still exact.
    (ox, _, _), _ = chunked_ray_components(rays_o, rays_d, ri[:-1])
    np.testing.assert_array_equal(
        np.asarray(ox), np.asarray(rays_o[ri[:-1], 0])
    )

    # Unbounded contraction parity.
    fu = NGPRadianceField(aabb=aabb, encoder_type="fused", n_levels=4,
                          n_features_per_level=16, log2_hashmap_size=15,
                          unbounded=True)
    pu = fu.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    s0u = fu.apply(pu, 3.0 * x, method="query_density")
    s1u = fu.apply(pu, tuple(3.0 * a for a in xs), method="query_density")
    np.testing.assert_allclose(
        np.asarray(s1u), np.asarray(s0u), rtol=1e-5, atol=1e-6
    )


def test_fused_pallas_table_grad_matches_scatter():
    """The Pallas sorted-reduction table gradient (table_grad="pallas",
    interpret mode off-TPU) reproduces autodiff's scatter-add, in f32 and
    bf16 compute, forward bit-exact."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=256)
    enc_s = HashGridEncoderFused(**kw, table_grad="scatter")
    enc_p = HashGridEncoderFused(**kw, table_grad="pallas")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1024, 3), dtype=np.float32))
    params = enc_s.init(jax.random.PRNGKey(0), x[:8])

    y_s = enc_s.apply(params, x)
    y_p = enc_p.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_p))

    ct = jnp.asarray(rng.standard_normal(y_s.shape).astype(np.float32))

    def loss(p, enc):
        return (enc.apply(p, x) * ct).sum()

    g_s = jax.grad(loss)(params, enc_s)["params"]["table"]
    g_p = jax.grad(loss)(params, enc_p)["params"]["table"]
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_s), rtol=1e-5, atol=1e-5
    )

    # bf16 compute: Pallas backward accumulates in f32 — compare against
    # the f32 reference with a bf16-appropriate tolerance.
    enc_pb = HashGridEncoderFused(**kw, table_grad="pallas",
                                  compute_dtype=jnp.bfloat16)
    g_pb = jax.grad(loss)(params, enc_pb)["params"]["table"]
    assert g_pb.dtype == jnp.float32
    denom = np.abs(np.asarray(g_s)).max()
    np.testing.assert_allclose(
        np.asarray(g_pb), np.asarray(g_s), atol=2e-2 * denom
    )


def test_fused_pallas_grad_with_paired_levels():
    """Pallas table gradient composes with chunk-paired coarse encoding:
    the paired path calls the lookup with a nonzero level base (zero-padded
    gradient block placement)."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=1024)
    enc_s = HashGridEncoderFused(**kw, table_grad="scatter")
    enc_p = HashGridEncoderFused(**kw, table_grad="pallas")
    rng = np.random.default_rng(1)
    o = rng.uniform(0.3, 0.7, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = 1e-3 * np.arange(4, dtype=np.float32)
    x = jnp.asarray(
        (o[:, None, :] + t[None, :, None] * d[:, None, :]).reshape(-1, 3)
    )
    params = enc_s.init(jax.random.PRNGKey(0), x[:8])
    ct = jnp.asarray(
        rng.standard_normal((x.shape[0], enc_s.latent_dim)).astype(np.float32)
    )

    def loss(p, enc):
        return (enc.apply(p, x, paired_levels=2) * ct).sum()

    g_s = jax.grad(loss)(params, enc_s)["params"]["table"]
    g_p = jax.grad(loss)(params, enc_p)["params"]["table"]
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_s), rtol=1e-5, atol=1e-5
    )


def test_fused_factor_table_grad_matches_scatter(monkeypatch):
    """The round-3 factor-path table gradient (table_grad="factor": backward
    consumes (w, dout) factors, rebuilds cotangent tiles in-kernel) must
    reproduce autodiff's scatter-add table gradient; forward bit-exact;
    w/position gradient is zero BY CONTRACT.  Pinned to the exact w3 pack —
    the default u10 pack quantizes weights to 10 bits by design and has its
    own bound test (test_fused_factor_u10_pack_matches_w3)."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    monkeypatch.setenv("NERFACC_FACTOR_PACK", "w3")
    jax.clear_caches()

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=256)
    enc_s = HashGridEncoderFused(**kw, table_grad="scatter")
    enc_f = HashGridEncoderFused(**kw, table_grad="factor")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1024, 3), dtype=np.float32))
    params = enc_s.init(jax.random.PRNGKey(0), x[:8])

    y_s = enc_s.apply(params, x)
    y_f = enc_f.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_s), rtol=1e-6, atol=1e-7
    )

    ct = jnp.asarray(rng.standard_normal(y_s.shape).astype(np.float32))

    def loss(p, enc):
        return (enc.apply(p, x) * ct).sum()

    g_s = jax.grad(loss)(params, enc_s)["params"]["table"]
    g_f = jax.grad(loss)(params, enc_f)["params"]["table"]
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_s), rtol=1e-4, atol=1e-4
    )

    # bf16 compute: factor payload is bf16, accumulation f32.
    enc_fb = HashGridEncoderFused(**kw, table_grad="factor",
                                  compute_dtype=jnp.bfloat16)
    g_fb = jax.grad(loss)(params, enc_fb)["params"]["table"]
    assert g_fb.dtype == jnp.float32
    denom = np.abs(np.asarray(g_s)).max()
    np.testing.assert_allclose(
        np.asarray(g_fb), np.asarray(g_s), atol=2e-2 * denom
    )

    # The zero-dw contract must not poison table grads when x DOES flow:
    # grads wrt x are zero (documented), table grad still correct above.
    dx = jax.grad(lambda xx: (enc_f.apply(params, xx) * ct).sum())(x)
    np.testing.assert_array_equal(np.asarray(dx), 0.0)


def test_fused_factor_carry_move_matches_take(monkeypatch):
    """NERFACC_FACTOR_MOVE=carry (factor columns carried through lax.sort)
    must produce the same table gradient as the take-permute movement."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=256)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((777, 3), dtype=np.float32))
    ct_holder = {}

    def loss(p, enc):
        y = enc.apply(p, x)
        ct = ct_holder.setdefault(
            "ct", jnp.asarray(
                rng.standard_normal(y.shape).astype(np.float32)
            )
        )
        return (y * ct).sum()

    for cdt in (None, jnp.bfloat16):
        enc = HashGridEncoderFused(**kw, table_grad="factor",
                                   compute_dtype=cdt)
        params = enc.init(jax.random.PRNGKey(0), x[:8])
        monkeypatch.setenv("NERFACC_FACTOR_MOVE", "take")
        g_take = jax.grad(loss)(params, enc)["params"]["table"]
        monkeypatch.setenv("NERFACC_FACTOR_MOVE", "carry")
        jax.clear_caches()  # env is read at trace time
        g_carry = jax.grad(loss)(params, enc)["params"]["table"]
        monkeypatch.delenv("NERFACC_FACTOR_MOVE")
        jax.clear_caches()
        np.testing.assert_allclose(
            np.asarray(g_carry), np.asarray(g_take), rtol=1e-6, atol=1e-6
        )


def test_fused_factor_w3_pack_matches_w8(monkeypatch):
    """NERFACC_FACTOR_PACK=w3 (backward carries only the three fractional
    cell weights; corner weights rebuilt in-kernel) must reproduce the w8
    packing's forward and table gradient in both compute dtypes."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=256)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1021, 3), dtype=np.float32))
    ct_holder = {}

    def loss(p, enc):
        y = enc.apply(p, x)
        ct = ct_holder.setdefault(
            "ct", jnp.asarray(
                rng.standard_normal(y.shape).astype(np.float32)
            )
        )
        return (y * ct).sum()

    for cdt, tol in ((None, 1e-6), (jnp.bfloat16, 0.0)):
        enc = HashGridEncoderFused(**kw, table_grad="factor",
                                   compute_dtype=cdt)
        params = enc.init(jax.random.PRNGKey(0), x[:8])
        monkeypatch.setenv("NERFACC_FACTOR_PACK", "w8")
        jax.clear_caches()  # env is read at trace time
        y8 = enc.apply(params, x)
        g8 = jax.grad(loss)(params, enc)["params"]["table"]
        monkeypatch.setenv("NERFACC_FACTOR_PACK", "w3")
        jax.clear_caches()
        y3 = enc.apply(params, x)
        g3 = jax.grad(loss)(params, enc)["params"]["table"]
        monkeypatch.delenv("NERFACC_FACTOR_PACK")
        jax.clear_caches()
        # w3's forward is the lane-native MXU combine (f32 accumulation,
        # one rounding at the end) while w8 keeps the einsum — identical
        # math, different accumulation order, so bound by output ulps.
        ydenom = np.abs(np.asarray(y8, np.float32)).max()
        np.testing.assert_allclose(
            np.asarray(y3, np.float32), np.asarray(y8, np.float32),
            atol=(2e-7 if cdt is None else 1e-2) * ydenom,
        )
        if cdt is None:
            np.testing.assert_allclose(
                np.asarray(g3), np.asarray(g8), rtol=1e-5, atol=tol
            )
        else:
            # bf16: w3 rounds (wx,wy,wz) where w8 rounds the f32-built
            # corner products — bounded repacking noise, not drift.
            denom = np.abs(np.asarray(g8)).max()
            np.testing.assert_allclose(
                np.asarray(g3), np.asarray(g8), atol=2e-2 * denom
            )


def test_fused_factor_u10_pack_matches_w3(monkeypatch):
    """NERFACC_FACTOR_PACK=u10 (10-bit fixed-point weights, one int32 sort
    operand) must match the w3 gradients within the quantization bound:
    per-axis weight error <= 2^-11, so corner-product error <~ 1.5e-3 of
    the cotangent scale."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=256)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1021, 3), dtype=np.float32))
    ct = jnp.asarray(rng.standard_normal((1021, 64)).astype(np.float32))

    def loss(p, enc):
        return (enc.apply(p, x) * ct).sum()

    enc = HashGridEncoderFused(**kw, table_grad="factor",
                               compute_dtype=jnp.bfloat16)
    params = enc.init(jax.random.PRNGKey(0), x[:8])
    monkeypatch.setenv("NERFACC_FACTOR_PACK", "w3")
    jax.clear_caches()
    g3 = jax.grad(loss)(params, enc)["params"]["table"]
    monkeypatch.setenv("NERFACC_FACTOR_PACK", "u10")
    jax.clear_caches()
    gu = jax.grad(loss)(params, enc)["params"]["table"]
    monkeypatch.delenv("NERFACC_FACTOR_PACK")
    jax.clear_caches()
    denom = np.abs(np.asarray(g3)).max()
    np.testing.assert_allclose(
        np.asarray(gu), np.asarray(g3), atol=2e-2 * denom
    )


def test_fused_factor_batched_sort_matches_per_level(monkeypatch):
    """NERFACC_FACTOR_BATCH=1 (ONE cross-level sort + ONE kernel over the
    whole table instead of per-level ones) must reproduce the per-level
    u10 gradients: the keys are globally unique per level span, so batching
    only changes the partitioning of identical work.  Tolerance is a few
    f32 ulps, not bit-exact: the factor sorts run ``is_stable=False`` (the
    stability iota operand costs ~0.15 ms/sort of carry for nothing the
    kernel needs), so addition order within equal keys is
    implementation-defined."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=256)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((1021, 3), dtype=np.float32))
    ct = jnp.asarray(rng.standard_normal((1021, 64)).astype(np.float32))

    def loss(p, enc):
        return (enc.apply(p, x) * ct).sum()

    enc = HashGridEncoderFused(**kw, table_grad="factor",
                               compute_dtype=jnp.bfloat16)
    params = enc.init(jax.random.PRNGKey(0), x[:8])
    monkeypatch.setenv("NERFACC_FACTOR_PACK", "u10")
    monkeypatch.setenv("NERFACC_FACTOR_BATCH", "0")
    jax.clear_caches()
    g_per = jax.grad(loss)(params, enc)["params"]["table"]
    monkeypatch.setenv("NERFACC_FACTOR_BATCH", "1")
    jax.clear_caches()
    g_bat = jax.grad(loss)(params, enc)["params"]["table"]
    monkeypatch.delenv("NERFACC_FACTOR_BATCH")
    monkeypatch.delenv("NERFACC_FACTOR_PACK")
    jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(g_bat), np.asarray(g_per), rtol=3e-6, atol=1e-7
    )


def test_fused_factor_lanes_unpack_matches_t3(monkeypatch):
    """NERFACC_DOUT_UNPACK=lanes (elementwise shift/mask bf16-pair unpack,
    no minor-2 transpose) must be bit-identical to the t3 layout path in
    every packing that moves bf16 pair columns through the sort."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderFused

    kw = dict(n_levels=4, n_features_per_level=16, log2_hashmap_size=9,
              max_resolution=256)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((1021, 3), dtype=np.float32))
    ct = jnp.asarray(rng.standard_normal((1021, 64)).astype(np.float32))

    def loss(p, enc):
        return (enc.apply(p, x) * ct).sum()

    enc = HashGridEncoderFused(**kw, table_grad="factor",
                               compute_dtype=jnp.bfloat16)
    params = enc.init(jax.random.PRNGKey(0), x[:8])
    for pack in ("u10", "w3", "w8"):
        monkeypatch.setenv("NERFACC_FACTOR_PACK", pack)
        monkeypatch.setenv("NERFACC_DOUT_UNPACK", "t3")
        jax.clear_caches()
        g_t3 = jax.grad(loss)(params, enc)["params"]["table"]
        monkeypatch.setenv("NERFACC_DOUT_UNPACK", "lanes")
        jax.clear_caches()
        g_ln = jax.grad(loss)(params, enc)["params"]["table"]
        np.testing.assert_array_equal(
            np.asarray(g_ln), np.asarray(g_t3), err_msg=f"pack={pack}"
        )
    monkeypatch.delenv("NERFACC_DOUT_UNPACK")
    monkeypatch.delenv("NERFACC_FACTOR_PACK")
    jax.clear_caches()


def _grouped_oracle(table, x, n_levels, F, T, resolutions, key_levels,
                    split):
    """Independent numpy oracle for HashGridEncoderGrouped (split-key
    rows): fetch lg covers levels [lg*Jg, (lg+1)*Jg) = row-sub-level
    window (lg % split)*Jg of span lg // split; level l's features come
    from lanes [c*(J*F) + j*F + f] of the row keyed by the fetch's KEY
    level cell; weights are true trilinear fracs at the KEY level and
    continuous triangle waves at every other sub-level."""
    primes = (1, 2654435761, 805459861)
    J = 128 // (8 * F)
    Jg = J // split
    LG = n_levels // Jg
    n = x.shape[0]
    out = np.zeros((n, n_levels * F), np.float64)
    tab = np.asarray(table, np.float64)

    def tri(t):
        h = t * 0.5
        return 1.0 - np.abs(2.0 * (h - np.floor(h)) - 1.0)

    for i in range(n):
        for lg in range(LG):
            span = lg // split
            j_lo = (lg % split) * Jg
            kl = key_levels[lg]
            rk = resolutions[kl]
            c = np.floor(x[i] * rk).astype(np.int64)
            if (rk**3) <= T:
                idx = int((c[0] * rk + c[1]) * rk + c[2]) & (T - 1)
            else:
                h = (
                    (np.uint32(c[0]) * np.uint32(primes[0]))
                    ^ (np.uint32(c[1]) * np.uint32(primes[1]))
                    ^ (np.uint32(c[2]) * np.uint32(primes[2]))
                ) & np.uint32(T - 1)
                idx = int(h)
            row = tab[span * T + idx]
            for k in range(Jg):
                lvl = lg * Jg + k
                j = j_lo + k
                r = resolutions[lvl]
                if lvl == kl:
                    f3 = x[i] * r - np.floor(x[i] * r)
                else:
                    f3 = tri(x[i] * r)
                for corner in range(8):
                    dx, dy, dz = (
                        (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
                    )
                    w = (
                        (f3[0] if dx else 1 - f3[0])
                        * (f3[1] if dy else 1 - f3[1])
                        * (f3[2] if dz else 1 - f3[2])
                    )
                    for f in range(F):
                        out[i, lvl * F + f] += (
                            w * row[corner * J * F + j * F + f]
                        )
    return out


def test_grouped_encoder_matches_numpy_oracle():
    """The grouped encoder's f32 path must agree with a from-scratch
    numpy implementation of its parameterization (split-key row fetches,
    collision-budget key rule, key-frac/non-key-triangle weights, lane
    layout)."""
    from nerfacc_tpu.models.hash_soa import (
        HashGridEncoderGrouped,
        grid_resolutions,
    )

    L, F, log2T = 16, 2, 9
    enc = HashGridEncoderGrouped(
        n_levels=L, n_features_per_level=F, log2_hashmap_size=log2T,
        max_resolution=256, table_grad="scatter",
    )
    rng = np.random.default_rng(3)
    x = rng.random((37, 3)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x[:4]))
    y = np.asarray(enc.apply(params, jnp.asarray(x)))

    table = np.asarray(params["params"]["table"], np.float64) - 1e-4
    # Key rule cross-check at T=2^9, cap 16 (8192 cells), split 4
    # (windows of 2 levels): res ladder [16, 19, 23, 27, 33, 40, 48, 58,
    # 70, 84, 101, 122, 147, 176, 212, 255] -> finest level per window
    # within budget: 1 (20^3=8000), 3 (13824 > 8192 -> 27? 28^3=21952 >
    # -> falls to... see computed), rest fall back to window-finest.
    keys = enc.fetch_key_levels()
    assert len(keys) == 8 and keys[0] == 1
    assert all(
        keys[w] in range(w * 2, w * 2 + 2) for w in range(8)
    )
    want = _grouped_oracle(
        table, x.astype(np.float64), L, F, 1 << log2T,
        grid_resolutions(L, 16, 256), keys, split=4,
    )
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_grouped_factor_grad_matches_scatter():
    """The positional factor backward (sort-carried f32 positions, fracs
    recomputed in-kernel) must reproduce the autodiff scatter gradient
    within bf16 payload rounding."""
    from nerfacc_tpu.models.hash_soa import HashGridEncoderGrouped

    kw = dict(n_levels=16, n_features_per_level=2, log2_hashmap_size=9,
              max_resolution=256, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1021, 3), dtype=np.float32))
    ct = jnp.asarray(rng.standard_normal((1021, 32)).astype(np.float32))

    def loss(p, enc):
        return (enc.apply(p, x) * ct).sum()

    enc_f = HashGridEncoderGrouped(**kw, table_grad="factor")
    enc_s = HashGridEncoderGrouped(**kw, table_grad="scatter")
    params = enc_f.init(jax.random.PRNGKey(0), x[:8])
    np.testing.assert_array_equal(
        np.asarray(enc_f.apply(params, x)), np.asarray(enc_s.apply(params, x))
    )
    gf = np.asarray(jax.grad(loss)(params, enc_f)["params"]["table"])
    gs = np.asarray(jax.grad(loss)(params, enc_s)["params"]["table"])
    denom = max(np.abs(gs).max(), 1e-6)
    np.testing.assert_allclose(gf, gs, atol=2e-2 * denom)
    # Zero-position-gradient contract on the factor path.
    def loss_x(xv):
        return (enc_f.apply(params, xv) * ct).sum()
    gx = np.asarray(jax.grad(loss_x)(x))
    assert np.all(gx == 0.0)


def test_grouped_ngp_field_tcnn_param_budget():
    """NGPRadianceField(encoder_type='grouped') at the reference NGP config
    must carry EXACTLY the tcnn parameter count (16L x 2F x 2^19 entries ==
    2 groups x 2^16 rows x 128 lanes) and train end-to-end."""
    from nerfacc_tpu.models.ngp import NGPRadianceField

    field = NGPRadianceField(
        aabb=[0, 0, 0, 1, 1, 1], encoder_type="grouped",
        n_levels=16, n_features_per_level=2, log2_hashmap_size=15,
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((128, 3), dtype=np.float32))
    d = jnp.asarray(rng.standard_normal((128, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    params = field.init(jax.random.PRNGKey(0), x[:8], d[:8])
    assert params["params"]["encoder"]["table"].size == 16 * 2 * 2**15

    def loss(p):
        rgb, dens = field.apply(p, x, d)
        return (rgb.astype(jnp.float32) ** 2).sum() + (dens ** 2).sum()

    g = jax.grad(loss)(params)
    gt = np.asarray(g["params"]["encoder"]["table"])
    assert np.isfinite(gt).any() and (np.abs(gt) > 0).any()
    # SoA tuple input (the render-path fast input) agrees with (n, 3).
    d_soa = field.apply(
        params, (x[:, 0], x[:, 1], x[:, 2]), method=field.query_density
    )
    d_aos = field.apply(params, x, method=field.query_density)
    np.testing.assert_allclose(
        np.asarray(d_soa), np.asarray(d_aos), atol=1e-5
    )
