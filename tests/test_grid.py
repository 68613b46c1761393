"""Port of tests/test_grid.py — the traversal property tests and the
mark_invisible_cells golden voxel counts (cross-framework anchors)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.estimators.occ_grid import OccGridEstimator
from nerfacc_tpu.grid import (
    _enlarge_aabb,
    _query,
    ray_aabb_intersect,
    traverse_grids,
)


def _rand_rays(n_rays, seed=42, origin_scale=1.0):
    rng = np.random.default_rng(seed)
    rays_o = rng.normal(size=(n_rays, 3)).astype(np.float32) * origin_scale
    rays_d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    return jnp.asarray(rays_o), jnp.asarray(rays_d)


def test_ray_aabb_intersect():
    rng = np.random.default_rng(42)
    n_rays, n_aabbs = 1000, 100
    rays_o = jnp.asarray(rng.random((n_rays, 3), dtype=np.float32))
    rays_d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rays_d = jnp.asarray(rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True))
    aabb_min = rng.random((n_aabbs, 3), dtype=np.float32)
    aabb_max = aabb_min + rng.random((n_aabbs, 3), dtype=np.float32)
    aabbs = jnp.asarray(np.concatenate([aabb_min, aabb_max], -1))

    tmins, tmaxs, hits = ray_aabb_intersect(rays_o, rays_d, aabbs)

    # geometric property: clamped midpoints of hits lie inside the box
    tmids = jnp.clip((tmins + tmaxs) / 2, min=0.0)
    pts = tmids[:, :, None] * rays_d[:, None, :] + rays_o[:, None, :]
    inside = jnp.all(
        (pts >= aabb_min[None] - 1e-5) & (pts <= aabb_max[None] + 1e-5), -1
    )
    assert bool(jnp.all(inside == hits))


def test_traverse_grids_samples_are_occupied():
    """Every emitted sample's midpoint must query as occupied at its mip
    level (test_grid.py:39-68)."""
    rng = np.random.default_rng(42)
    n_rays, n_aabbs = 10, 4
    rays_o, rays_d = _rand_rays(n_rays)

    base_aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = jnp.stack([_enlarge_aabb(base_aabb, 2**i) for i in range(n_aabbs)])
    binaries = jnp.asarray(rng.random((n_aabbs, 32, 32, 32)) > 0.5)

    res = traverse_grids(
        rays_o, rays_d, binaries, aabbs,
        step_size=0.05, max_lattice_steps=1024,
    )
    t_mid = (res.t_starts + res.t_ends) / 2.0
    positions = rays_o[:, None, :] + rays_d[:, None, :] * t_mid[..., None]
    occs, selector = _query(positions, binaries, base_aabb)
    assert int(res.is_valid.sum()) > 0
    assert bool(jnp.all(jnp.where(res.is_valid, occs, True)))
    assert bool(jnp.all(jnp.where(res.is_valid, selector, True)))


def test_traverse_grids_test_mode():
    """Iterative over-allocate marching with termination-plane resumption
    must accumulate the same t sums as one-shot traversal
    (test_grid.py:72-131)."""
    rng = np.random.default_rng(42)
    n_rays, n_aabbs = 10, 4
    rays_o, rays_d = _rand_rays(n_rays)

    base_aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = jnp.stack([_enlarge_aabb(base_aabb, 2**i) for i in range(n_aabbs)])
    binaries = jnp.asarray(rng.random((n_aabbs, 32, 32, 32)) > 0.5)

    kw = dict(step_size=0.05, max_lattice_steps=1024)
    ref = traverse_grids(rays_o, rays_d, binaries, aabbs, **kw)
    accum_starts = jnp.sum(jnp.where(ref.is_valid, ref.t_starts, 0.0), -1)
    accum_ends = jnp.sum(jnp.where(ref.is_valid, ref.t_ends, 0.0), -1)

    limit = 100
    near, mask = None, None
    acc_s, acc_e = 0.0, 0.0
    for _ in range(12):
        r = traverse_grids(
            rays_o, rays_d, binaries, aabbs,
            near_planes=near, traverse_steps_limit=limit,
            rays_mask=mask, **kw,
        )
        acc_s += jnp.sum(jnp.where(r.is_valid, r.t_starts, 0.0), -1)
        acc_e += jnp.sum(jnp.where(r.is_valid, r.t_ends, 0.0), -1)
        near = r.termination_planes
        mask = r.num_valid == limit
        if not bool(mask.any()):
            break
    assert not bool(mask.any())
    np.testing.assert_allclose(acc_s, accum_starts, atol=1e-1)
    np.testing.assert_allclose(acc_e, accum_ends, atol=1e-1)


def test_traverse_grids_with_near_far_planes():
    rays_o = jnp.asarray([[-1.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[1.0, 0.01, 0.01]])
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    binaries = jnp.ones((1, 1, 1, 1), bool)
    aabbs = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    near_planes = jnp.asarray([1.2])
    far_planes = jnp.asarray([1.5])
    step_size = 0.05

    res = traverse_grids(
        rays_o, rays_d, binaries, aabbs,
        near_planes=near_planes, far_planes=far_planes,
        step_size=step_size, max_lattice_steps=128,
    )
    assert int(res.is_valid.sum()) > 0
    valid = res.is_valid
    assert bool(jnp.all(jnp.where(valid, res.t_starts >= 1.2 - step_size / 2, True)))
    assert bool(jnp.all(jnp.where(valid, res.t_ends <= 1.5 + step_size / 2, True)))


def test_sampling_with_min_max_distances():
    rng = np.random.default_rng(42)
    n_rays, levels, resolution = 64, 4, 32
    render_step_size = 0.01

    rays_o = jnp.asarray(rng.random((n_rays, 3), dtype=np.float32) * 2 - 1)
    d = rng.random((n_rays, 3)).astype(np.float32)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    est = OccGridEstimator(
        roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=resolution, levels=levels
    )
    state = est.init()
    state = est.set_binaries(
        state,
        jnp.asarray(
            rng.random((levels, resolution, resolution, resolution)) > 0.5
        ),
    )
    t_min = jnp.asarray(rng.random((n_rays,), dtype=np.float32))
    t_max = t_min + jnp.asarray(rng.random((n_rays,), dtype=np.float32))

    ray_indices, t_starts, t_ends, is_valid = est.sampling(
        state, rays_o, rays_d,
        near_plane=0.15, far_plane=0.85,
        t_min=t_min, t_max=t_max,
        render_step_size=render_step_size,
        max_samples=128,
    )
    assert int(is_valid.sum()) > 0
    lo = t_min[ray_indices] - render_step_size / 2
    hi = t_max[ray_indices] + render_step_size / 2
    assert bool(jnp.all(jnp.where(is_valid, t_starts >= lo, True)))
    assert bool(jnp.all(jnp.where(is_valid, t_ends <= hi, True)))


def test_mark_invisible_cells():
    """Golden voxel counts from the reference (test_grid.py:207-233)."""
    levels, resolution = 4, 32
    width = height = 100
    fx, fy = width, height
    cx, cy = width / 2, height / 2

    est = OccGridEstimator(
        roi_aabb=[-1.0, -1.0, -1.0, 1.0, 1.0, 1.0],
        resolution=resolution,
        levels=levels,
    )
    state = est.init()

    K = jnp.asarray([[[fx, 0, cx], [0, fy, cy], [0, 0, 1]]], jnp.float32)
    pose = jnp.asarray(
        [[[-1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, -1.0, 2.5]]], jnp.float32
    )
    state = est.mark_invisible_cells(state, K, pose, width, height)
    assert int((state.occs == -1).sum()) == 77660
    assert int((state.occs == 0).sum()) == 53412


def test_skip_grid_traversal_matches_dense():
    """Macro-skip traversal must emit the same samples as dense traversal
    (the skip grid is conservative by construction)."""
    from nerfacc_tpu.grid import build_skip_grid

    rng = np.random.default_rng(3)
    n_rays = 32
    rays_o, rays_d = _rand_rays(n_rays, seed=3, origin_scale=2.0)

    base_aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = base_aabb[None]
    # coherent occupancy: a shell
    g = (np.arange(64) + 0.5) / 64 * 2 - 1
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    binaries = jnp.asarray((np.abs(r - 0.5) < 0.1)[None])
    skip = build_skip_grid(binaries, factor=4)

    kw = dict(step_size=0.02, max_lattice_steps=256)
    dense = traverse_grids(rays_o, rays_d, binaries, aabbs, **kw)
    skipr = traverse_grids(
        rays_o, rays_d, binaries, aabbs,
        skip_grid=skip, macro_stride=8, max_macro_segments=24, **kw,
    )
    np.testing.assert_array_equal(dense.num_valid, skipr.num_valid)
    # same sample positions where valid
    for a, b in [(dense.t_starts, skipr.t_starts), (dense.t_ends, skipr.t_ends)]:
        np.testing.assert_allclose(
            jnp.where(dense.is_valid, a, 0.0),
            jnp.where(skipr.is_valid, b, 0.0),
            atol=1e-5,
        )


def test_traverse_cone_angle_geometric_steps():
    """cone_angle > 0 uses the geometric ladder (grid.cu:23-28 semantics):
    step sizes grow ~linearly with t, samples stay in occupied cells."""
    rng = np.random.default_rng(7)
    n_rays = 8
    rays_o, rays_d = _rand_rays(n_rays, seed=7, origin_scale=3.0)

    base_aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = jnp.stack([_enlarge_aabb(base_aabb, 2**i) for i in range(4)])
    binaries = jnp.ones((4, 16, 16, 16), bool)

    cone = 0.01
    res = traverse_grids(
        rays_o, rays_d, binaries, aabbs,
        step_size=0.01, cone_angle=cone, max_lattice_steps=512,
        traverse_steps_limit=512,
    )
    assert int(res.is_valid.sum()) > 0
    dt = res.t_ends - res.t_starts
    valid = np.asarray(res.is_valid)
    dtv = np.asarray(dt)
    tsv = np.asarray(res.t_starts)
    # steps grow with t: dt ~= clamp(t * cone, step, inf)
    sel = valid & (tsv * cone > 0.012)
    np.testing.assert_allclose(
        dtv[sel], (tsv * cone)[sel], rtol=0.05
    )
    # near region: constant min step
    sel0 = valid & (tsv * cone < 0.008) & (tsv > 0)
    if sel0.any():
        np.testing.assert_allclose(dtv[sel0], 0.01, rtol=1e-4)


def test_cone_macro_skip_preserves_samples():
    """Geometric-ladder (cone>0) macro skipping must keep exactly the
    samples the dense lattice finds, as long as the macro budget covers the
    occupied spans (the 360/unbounded fast path)."""
    from nerfacc_tpu.grid import build_skip_grid

    n_rays = 24
    rng9 = np.random.default_rng(9)
    d9 = rng9.normal(size=(n_rays, 3)).astype(np.float32)
    d9 /= np.linalg.norm(d9, axis=-1, keepdims=True)
    rays_o = jnp.asarray(-3.0 * d9)
    rays_d = jnp.asarray(d9)
    base_aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = jnp.stack([_enlarge_aabb(base_aabb, 2**i) for i in range(2)])

    # sparse shell occupancy in both levels
    g = (np.arange(32) + 0.5) / 32 * 2 - 1
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    shell = np.abs(r - 0.55) < 0.12
    binaries = jnp.asarray(np.stack([shell, shell]))
    skip = build_skip_grid(binaries, 2)

    kw = dict(step_size=0.01, cone_angle=0.008, max_lattice_steps=512,
              traverse_steps_limit=256)
    dense = traverse_grids(rays_o, rays_d, binaries, aabbs, **kw)
    macro = traverse_grids(
        rays_o, rays_d, binaries, aabbs,
        skip_grid=skip, macro_stride=16, max_macro_segments=16, **kw,
    )
    assert int(dense.is_valid.sum()) > 0
    for ray in range(n_rays):
        a = np.sort(
            np.asarray(dense.t_starts[ray])[np.asarray(dense.is_valid[ray])]
        )
        b = np.sort(
            np.asarray(macro.t_starts[ray])[np.asarray(macro.is_valid[ray])]
        )
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_macro_truncation_is_reported_on_solid_scene():
    """VERDICT r2 #5: a too-small macro budget on a solid scene must not
    fail silently — traverse_and_compact flags the affected rays, and the
    render driver surfaces the fraction in extras."""
    from nerfacc_tpu.grid import build_skip_grid, traverse_and_compact

    n_rays = 32
    rng = np.random.default_rng(5)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(2.5 * d)  # on a sphere, aimed at the center:
    rays_d = jnp.asarray(-d)  # every ray crosses the full ball chord

    base_aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = base_aabb[None]
    g = (np.arange(64) + 0.5) / 64 * 2 - 1
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    binaries = jnp.asarray((r < 0.9)[None])  # solid ball: many macro segs
    skip = build_skip_grid(binaries, factor=4)

    kw = dict(
        near_planes=jnp.zeros((n_rays,)),
        step_size=0.02,
        traverse_steps_limit=256,
        max_lattice_steps=256,
        skip_grid=skip,
        macro_stride=8,
    )
    tight = traverse_and_compact(
        rays_o, rays_d, binaries, aabbs, 8192, max_macro_segments=2, **kw
    )
    ample = traverse_and_compact(
        rays_o, rays_d, binaries, aabbs, 8192, max_macro_segments=24, **kw
    )
    assert tuple(ample.macro_truncated.shape) == (n_rays,)
    frac_tight = float(jnp.mean(tight.macro_truncated.astype(jnp.float32)))
    frac_ample = float(jnp.mean(ample.macro_truncated.astype(jnp.float32)))
    assert frac_tight > 0.5, frac_tight  # most rays cross >2 occupied segs
    assert frac_ample == 0.0, frac_ample
    # tail samples really were lost (the thing the flag warns about)
    assert int(tight.num_valid.sum()) < int(ample.num_valid.sum())

    # Driver surface: extras carries the fraction.
    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator as OGE
    from nerfacc_tpu.rendering import occgrid_render_rays

    est = OGE(roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=64, levels=1,
              skip_factor=4)
    state = est.set_binaries(est.init(), binaries)

    def rgb_sigma_fn(ts, te, ri):
        n = ts.shape[0]
        return jnp.ones((n, 3)) * 0.5, jnp.ones((n,)) * 5.0

    out = occgrid_render_rays(
        rgb_sigma_fn, None, est, state, rays_o, rays_d,
        render_step_size=0.02, max_macro_segments=2,
        sample_capacity=8192,
    )
    extras = out[4]
    assert float(extras["macro_truncated_frac"]) > 0.5


def test_occ_update_sort_compaction_matches_scatter(monkeypatch):
    """The sort-based occupied-cell compaction in the post-warmup update
    (NERFACC_OCC_COMPACT=sort, the default) must produce the same sampled
    cells — and hence the same state — as the rank-scatter variant: both
    land the occupied ids ascending in the first `total` slots."""
    import os
    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator

    est = OccGridEstimator(
        roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=16, levels=2
    )
    rng = np.random.default_rng(7)
    state0 = est.set_binaries(
        est.init(), jnp.asarray(rng.random((2, 16, 16, 16)) > 0.8)
    )

    def occ_eval_fn(x):
        return (jnp.linalg.norm(x, axis=-1) < 0.6).astype(jnp.float32) * 3.0

    key = jax.random.PRNGKey(3)
    outs = {}
    for impl in ("sort", "scatter"):
        monkeypatch.setenv("NERFACC_OCC_COMPACT", impl)
        jax.clear_caches()  # env is read at trace time
        outs[impl] = est._update(
            state0, step=10**9, occ_eval_fn=occ_eval_fn, key=key
        )
    monkeypatch.delenv("NERFACC_OCC_COMPACT")
    jax.clear_caches()
    np.testing.assert_array_equal(
        np.asarray(outs["sort"].occs), np.asarray(outs["scatter"].occs)
    )
    np.testing.assert_array_equal(
        np.asarray(outs["sort"].binaries), np.asarray(outs["scatter"].binaries)
    )


def test_occ_update_soa_positions_equivalent(monkeypatch):
    """NERFACC_OCC_SOA=1 probes the SAME cells as the (n, 3) path (only
    the within-cell jitter stream differs), so with a jitter-insensitive
    occ_eval_fn (constant per cell at this resolution) the resulting
    state must be identical; the eval fn must receive a component tuple."""
    from nerfacc_tpu.estimators.occ_grid import OccGridEstimator

    est = OccGridEstimator(
        roi_aabb=[-1, -1, -1, 1, 1, 1], resolution=16, levels=1
    )
    rng = np.random.default_rng(11)
    state0 = est.set_binaries(
        est.init(), jnp.asarray(rng.random((1, 16, 16, 16)) > 0.7)
    )
    saw_tuple = []

    def occ_eval_fn(x):
        if isinstance(x, tuple):
            saw_tuple.append(True)
            xs, ys, zs = x
        else:
            xs, ys, zs = x[..., 0], x[..., 1], x[..., 2]
        # Constant within each res-16 cell: floor to the cell lattice.
        fx = jnp.floor((xs + 1) * 8) / 8
        fy = jnp.floor((ys + 1) * 8) / 8
        fz = jnp.floor((zs + 1) * 8) / 8
        return ((fx + fy + fz) % 0.375)[..., None]

    key = jax.random.PRNGKey(5)
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("NERFACC_OCC_SOA", mode)
        jax.clear_caches()
        outs[mode] = est._update(
            state0, step=10**9, occ_eval_fn=occ_eval_fn, key=key
        )
    monkeypatch.delenv("NERFACC_OCC_SOA")
    jax.clear_caches()
    assert saw_tuple, "SoA mode must pass a component tuple"
    np.testing.assert_array_equal(
        np.asarray(outs["0"].occs), np.asarray(outs["1"].occs)
    )
    np.testing.assert_array_equal(
        np.asarray(outs["0"].binaries), np.asarray(outs["1"].binaries)
    )
