"""Pallas kernel tests (interpret mode on CPU) — kernel vs pure-jnp oracle,
and the integrated traversal path vs the XLA gather path."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.grid import _query_soa, traverse_and_compact
from nerfacc_tpu.ops import (
    bitpack_grid,
    occupancy_query_pallas,
    occupancy_query_ref,
)


def _shell_binaries(res=64):
    g = (np.arange(res) + 0.5) / res * 2 - 1
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    return jnp.asarray(np.abs(r - 0.45) < 0.1)


def test_kernel_matches_oracle_and_query_soa():
    rng = np.random.default_rng(0)
    for res in [(64, 64, 64), (32, 32, 32), (32, 16, 48)]:
        binaries = jnp.asarray(rng.random(res) < 0.1)
        aabb = jnp.asarray([-1.5, -1.0, -2.0, 1.5, 1.0, 2.0], jnp.float32)
        packed = bitpack_grid(binaries)
        p = rng.uniform(-2.2, 2.2, size=(4000, 3)).astype(np.float32)
        px, py, pz = (jnp.asarray(p[:, i]) for i in range(3))
        ref = occupancy_query_ref(binaries, aabb, px, py, pz)
        out = occupancy_query_pallas(
            packed, aabb, px, py, pz, resolution=res, tm=8, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        vals, _ = _query_soa(px, py, pz, binaries[None], aabb)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(vals))


def test_traversal_pallas_path_matches_xla_path():
    """traverse_and_compact must produce identical samples through the
    Pallas query kernel (interpret mode) and the XLA gather."""
    est = OccGridEstimator(roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=64,
                           levels=1, skip_factor=2)
    state = est.set_binaries(est.init(), _shell_binaries(64)[None])

    rng = np.random.default_rng(1)
    n_rays = 128
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-2.5 * d)
    rays_d = jnp.asarray(d)

    kw = dict(
        near_planes=jnp.zeros((n_rays,)),
        step_size=1e-2,
        traverse_steps_limit=128,
        max_lattice_steps=512,
        skip_grid=state.skip_grid,
        macro_stride=16,
        max_macro_segments=8,
    )
    ref = traverse_and_compact(
        rays_o, rays_d, state.binaries, state.aabbs, 4096, **kw
    )
    out = traverse_and_compact(
        rays_o, rays_d, state.binaries, state.aabbs, 4096,
        packed_grids=state.binaries_packed,
        packed_skip=state.skip_packed,
        pallas_interpret=True,
        **kw,
    )
    np.testing.assert_array_equal(np.asarray(ref.kept), np.asarray(out.kept))
    np.testing.assert_allclose(
        np.asarray(ref.t_starts), np.asarray(out.t_starts)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.ray_indices), np.asarray(out.ray_indices)
    )
    assert int(ref.kept.sum()) > 0


def test_chunked_compaction_matches_per_sample():
    """compact_chunk=4 must keep exactly the same (ray, t) samples as
    per-sample compaction (layout differs: invalid intra-chunk slots appear
    as kept=False zero-length intervals)."""
    est = OccGridEstimator(roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=64,
                           levels=1, skip_factor=2)
    state = est.set_binaries(est.init(), _shell_binaries(64)[None])

    rng = np.random.default_rng(3)
    n_rays = 64
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-2.5 * d)
    rays_d = jnp.asarray(d)

    kw = dict(
        near_planes=jnp.zeros((n_rays,)),
        step_size=1e-2,
        traverse_steps_limit=100,  # deliberately not a multiple of 4
        max_lattice_steps=512,
        skip_grid=state.skip_grid,
        macro_stride=16,
        max_macro_segments=8,
    )
    a = traverse_and_compact(
        rays_o, rays_d, state.binaries, state.aabbs, 4096,
        compact_chunk=1, **kw,
    )
    b = traverse_and_compact(
        rays_o, rays_d, state.binaries, state.aabbs, 4096,
        compact_chunk=4, **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(a.num_valid), np.asarray(b.num_valid)
    )
    np.testing.assert_allclose(
        np.asarray(a.termination_planes), np.asarray(b.termination_planes)
    )
    assert int(a.kept.sum()) == int(b.kept.sum()) > 0
    for arrs in (a, b):
        assert bool(jnp.all(arrs.t_ends >= arrs.t_starts))
    ka, kb = np.asarray(a.kept), np.asarray(b.kept)
    ra, rb = np.asarray(a.ray_indices), np.asarray(b.ray_indices)
    ta, tb = np.asarray(a.t_starts), np.asarray(b.t_starts)
    for ray in range(n_rays):
        sa = np.sort(ta[ka & (ra == ray)])
        sb = np.sort(tb[kb & (rb == ray)])
        np.testing.assert_allclose(sa, sb, rtol=1e-6)


def test_multilevel_dispatch_matches():
    """Multi-level (mip) Pallas dispatch vs _query_soa."""
    from nerfacc_tpu.grid import _query_dispatch

    rng = np.random.default_rng(2)
    levels = 3
    res = 32
    binaries = jnp.asarray(rng.random((levels, res, res, res)) < 0.1)
    base = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    packed = jax.vmap(bitpack_grid)(binaries)
    p = rng.uniform(-4.5, 4.5, size=(5000, 3)).astype(np.float32)
    px, py, pz = (jnp.asarray(p[:, i]) for i in range(3))
    want, _ = _query_soa(px, py, pz, binaries, base)
    got = _query_dispatch(px, py, pz, binaries, base, packed, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sorted_seg_bounds_accumulation_matches_segment_sum():
    """CompactSamples.seg_starts/seg_counts + the rendering(seg_bounds=...)
    cumsum path must reproduce the segment_sum path exactly — outputs AND
    gradients — and ray_indices must be globally sorted (padding included)."""
    from nerfacc_tpu.volrend import rendering

    est = OccGridEstimator(roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=64,
                           levels=1, skip_factor=2)
    state = est.set_binaries(est.init(), _shell_binaries(64)[None])

    rng = np.random.default_rng(7)
    n_rays = 96
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-2.5 * d)
    rays_d = jnp.asarray(d)

    cs = traverse_and_compact(
        rays_o, rays_d, state.binaries, state.aabbs, 4096,
        near_planes=jnp.zeros((n_rays,)),
        step_size=1e-2,
        traverse_steps_limit=128,
        max_lattice_steps=512,
        skip_grid=state.skip_grid,
        macro_stride=16,
        max_macro_segments=8,
    )
    ri = np.asarray(cs.ray_indices)
    assert (np.diff(ri) >= 0).all(), "ray_indices must be sorted incl. padding"
    # seg bounds cover exactly the slots carrying each ray's samples
    starts, counts = np.asarray(cs.seg_starts), np.asarray(cs.seg_counts)
    kept = np.asarray(cs.kept)
    for ray in np.unique(ri[kept]):
        sl = np.flatnonzero(kept & (ri == ray))
        assert starts[ray] <= sl.min() and sl.max() < starts[ray] + counts[ray]

    theta = jnp.asarray(0.7)

    def render(th, seg_bounds):
        def rgb_sigma_fn(t0, t1, rix):
            mid = (t0 + t1) / 2
            rgb = jnp.stack([jnp.sin(mid * th), jnp.cos(mid), mid * 0 + 0.5],
                            axis=-1)
            sigma = 30.0 * jnp.exp(-mid * th)
            return rgb, sigma

        c, o, dep, _ = rendering(
            cs.t_starts, cs.t_ends, ray_indices=cs.ray_indices,
            n_rays=n_rays, rgb_sigma_fn=rgb_sigma_fn,
            render_bkgd=jnp.ones(3), is_valid=cs.kept,
            seg_bounds=seg_bounds,
        )
        return c, o, dep

    c0, o0, d0 = render(theta, None)
    c1, o1, d1 = render(theta, (cs.seg_starts, cs.seg_counts))
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)

    g0 = jax.grad(lambda th: render(th, None)[0].sum())(theta)
    g1 = jax.grad(
        lambda th: render(th, (cs.seg_starts, cs.seg_counts))[0].sum()
    )(theta)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4)


def test_sort_compaction_matches_scatter(monkeypatch):
    """NERFACC_COMPACT_IMPL=sort must reproduce the scatter inversion
    bit-exactly (same packed chunks land in the same slots)."""
    est = OccGridEstimator(roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=64,
                           levels=1, skip_factor=2)
    state = est.set_binaries(est.init(), _shell_binaries(64)[None])

    rng = np.random.default_rng(11)
    n_rays = 128
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-2.5 * d)
    rays_d = jnp.asarray(d)

    kw = dict(
        near_planes=jnp.zeros((n_rays,)),
        step_size=1e-2,
        traverse_steps_limit=128,
        max_lattice_steps=512,
        skip_grid=state.skip_grid,
        macro_stride=16,
        max_macro_segments=8,
    )
    # Small capacity also exercises the capacity-truncation branch.
    for cap in (4096, 1024):
        monkeypatch.setenv("NERFACC_COMPACT_IMPL", "scatter")
        a = traverse_and_compact(
            rays_o, rays_d, state.binaries, state.aabbs, cap,
            compact_chunk=4, **kw,
        )
        monkeypatch.setenv("NERFACC_COMPACT_IMPL", "sort")
        b = traverse_and_compact(
            rays_o, rays_d, state.binaries, state.aabbs, cap,
            compact_chunk=4, **kw,
        )
        for fa, fb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_cell_max_sorted_occ_scale_values():
    """The sortmax EMA must be exact for occupancy-scale values (~1e-3).

    Round-4 device lesson: a Pallas ``dot_general`` with f32 operands at
    DEFAULT precision downcasts to bf16 on the MXU; with the kernel's +1
    placement bias that quantized tiny occ values to zero, silently
    emptying the occupancy grid (constant-PSNR training collapse).  The
    kernel pins ``precision=HIGHEST``; this test guards the tiny-value
    contract end-to-end.
    """
    import numpy as np

    from nerfacc_tpu.ops.table_grad import cell_max_sorted

    rng = np.random.default_rng(3)
    n_cells = 1 << 15
    ids = jnp.asarray(rng.integers(0, n_cells, 50000).astype(np.int32))
    vals = jnp.asarray(rng.random(50000, dtype=np.float32) * 4e-3)
    want = np.asarray(jnp.full((n_cells,), -1.0).at[ids].max(vals))
    got = np.asarray(
        cell_max_sorted(ids, vals, n_cells=n_cells, WC=4096, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_slice_combine_matches_einsum():
    """``NERFACC_COMBINE=slice`` (row-major lane-slice corner combine, the
    relayout-free forward) matches the einsum contraction to bf16 ulp."""
    import numpy as np

    from nerfacc_tpu.ops.table_grad import _slice_combine

    rng = np.random.default_rng(5)
    N, F = 1024, 16
    g = jnp.asarray(rng.standard_normal((N, 8 * F)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.random((N, 8), dtype=np.float32))
    want = jnp.einsum(
        "kc,kcf->kf", w.astype(jnp.bfloat16), g.reshape(N, 8, F)
    ).astype(jnp.float32)
    got = _slice_combine(g, [w[:, c] for c in range(8)], F).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05)
