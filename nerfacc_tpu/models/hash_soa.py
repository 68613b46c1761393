"""Structure-of-arrays hash-grid encoding (layout-optimal for TPU).

Why this exists: on TPU, a ``(N, 2)`` or ``(N, L, 8, 3)`` tensor is tiled
``T(8, 128)`` along its minor dims — a 2-wide minor dimension pads 64x in
both memory *and* bandwidth.  The first encoder implementation
(:class:`~nerfacc_tpu.models.encoding.HashGridEncoder`) materializes exactly
such tensors and measured ~100x below HBM speed-of-light on v5e.

This variant keeps every hot intermediate either 1-D ``(n,)`` (tiled
``T(1024)``, no padding) or 2-D with the *sample* axis minor — corner loops
are unrolled statically (8 corners), level batching uses ``(L, n)`` shapes,
and the feature table is stored as ``(F, L*T)`` so each feature channel is a
flat 1-D gather.  The backward pass is the transpose 1-D scatter-add derived
by autodiff.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

_PRIMES = (1, 2654435761, 805459861)

_LANE_WIDTH = 128  # TPU lane width; the Pallas table-grad path needs 8F == 128


def grid_resolutions(
    n_levels: int, base_resolution: int, max_resolution: int
):
    """tcnn geometric level resolutions (``ngp.py:99-129`` growth rule)."""
    if n_levels == 1:
        return [base_resolution]
    growth = np.exp(
        (np.log(max_resolution) - np.log(base_resolution)) / (n_levels - 1)
    )
    return [
        int(np.floor(base_resolution * growth**l)) for l in range(n_levels)
    ]


def paired_safe_level_count(
    resolutions, span: float, chunk: int = 4, margin: float = 2.0
) -> int:
    """Number of coarsest levels whose cell size exceeds
    ``margin * chunk * span`` (``span`` = per-sample spacing in the
    encoder's [0,1] input coords) — the levels safe for chunk-paired
    gathers (see :meth:`HashGridEncoderFused.__call__`)."""
    p = 0
    for r in resolutions:
        if 1.0 / r > margin * chunk * span:
            p += 1
        else:
            break
    return p


class HashGridEncoderSoA(nn.Module):
    """Drop-in replacement for ``HashGridEncoder`` (same param count and
    semantics; table layout ``(F, L*T)`` instead of ``(L*T, F)``)."""

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 4096

    @property
    def latent_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def _resolutions(self):
        if self.n_levels == 1:
            return [self.base_resolution]
        growth = np.exp(
            (np.log(self.max_resolution) - np.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        return [
            int(np.floor(self.base_resolution * growth**l))
            for l in range(self.n_levels)
        ]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        T = 1 << self.log2_hashmap_size
        L, F = self.n_levels, self.n_features_per_level
        resolutions = self._resolutions()

        table = self.param(
            "table", nn.initializers.uniform(scale=2e-4), (F, L * T)
        )
        table = table - 1e-4

        batch_shape = x.shape[:-1]
        n = int(np.prod(batch_shape)) if batch_shape else 1

        # SoA: three 1-D coordinate arrays.
        xs = x[..., 0].reshape(n)
        ys = x[..., 1].reshape(n)
        zs = x[..., 2].reshape(n)

        res = jnp.asarray(resolutions, x.dtype)[:, None]  # (L, 1)
        # (L, n) per-axis scaled coords.
        xl = xs[None, :] * res
        yl = ys[None, :] * res
        zl = zs[None, :] * res
        c0x = jnp.floor(xl)
        c0y = jnp.floor(yl)
        c0z = jnp.floor(zl)
        wx = xl - c0x
        wy = yl - c0y
        wz = zl - c0z
        c0x = c0x.astype(jnp.int32)
        c0y = c0y.astype(jnp.int32)
        c0z = c0z.astype(jnp.int32)

        res_i = jnp.asarray(resolutions, jnp.int32)[:, None]  # (L, 1)
        n_dense = (res_i + 1) ** 3
        use_dense = n_dense <= T  # (L, 1)
        stride = res_i + 1
        level_offset = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]

        def corner_index(cx, cy, cz):
            dense_idx = (cx * stride + cy) * stride + cz
            h = (
                (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
                ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
                ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
            ) & jnp.uint32(T - 1)
            idx = jnp.where(use_dense, dense_idx & (T - 1), h.astype(jnp.int32))
            return (idx + level_offset).reshape(-1)  # (L*n,)

        out = [jnp.zeros((L, n), x.dtype) for _ in range(F)]
        for dx in (0, 1):
            wxc = wx if dx else 1.0 - wx
            cx = c0x + dx
            for dy in (0, 1):
                wyc = wy if dy else 1.0 - wy
                cy = c0y + dy
                wxy = wxc * wyc
                for dz in (0, 1):
                    wzc = wz if dz else 1.0 - wz
                    cz = c0z + dz
                    w = wxy * wzc  # (L, n)
                    idx = corner_index(cx, cy, cz)
                    for f in range(F):
                        feats = jnp.take(table[f], idx).reshape(L, n)
                        out[f] = out[f] + feats * w

        # [F x (L, n)] -> (n, L*F) feature-fastest, matching the AoS encoder.
        stacked = jnp.stack(out, axis=1)  # (L, F, n)
        stacked = jnp.transpose(stacked, (2, 0, 1))  # (n, L, F)
        return stacked.reshape(batch_shape + (L * F,))


class HashGridEncoderFused(nn.Module):
    """Corner-fused hash encoding: ONE gather per (sample, level).

    XLA's TPU gather costs ~5 ns per *index* regardless of row width
    (measured on v5e), so the standard 8-corner layout pays 8x the
    fundamental cost.  Here the table row is keyed by the *cell* and holds
    all 8 corner features contiguously (``8*F`` wide); a sample-level lookup
    is a single row fetch + in-register trilinear combine.

    Trade-off (documented): corner features are no longer shared between
    neighboring cells, so the field is only C0-continuous *within* cells —
    the same kind of aliasing the hash collisions of Instant-NGP already
    introduce; the MLP head smooths it.  Quality is within noise on the
    procedural benchmark; use :class:`HashGridEncoderSoA` when exact tcnn
    parametrization matters.

    Layout: table stored row-major ``(L*T, 8*F)`` — row gathers AND the
    autodiff row-scatter backward both run at the ~6-8 ns/index wall, whereas
    a column-scatter is ~13x slower (measured on v5e).
    """

    n_levels: int = 8
    n_features_per_level: int = 4
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 4096
    # Optional low-precision compute (e.g. jnp.bfloat16): the f32 master
    # table is cast once per step, halving gather/einsum HBM traffic; cell
    # coords and trilinear weights stay f32 (bf16's 8-bit mantissa would
    # quantize positions), only the feature math drops precision.  tcnn
    # trains its tables in fp16 (ngp.py:99-137) — same numerics class.
    compute_dtype: Optional[jnp.dtype] = None
    # Table-gradient strategy.  "scatter" (and currently "auto") uses
    # autodiff's scatter-add; "pallas" opts into the sorted windowed
    # one-hot MXU reduction (ops/table_grad.py).  Measured on v5e at the
    # flagship config: XLA's scatter-add is 30.8 ms (44% of the train
    # step, trace-confirmed); the Pallas kernel itself is 4.1 ms, but the
    # payload permutation into sorted order costs 22.5 ms (random 256 B
    # row reads with ZERO reuse run at ~48 GB/s — unlike the hash gather,
    # whose 16x row reuse reaches 138 GB/s), so end-to-end the two paths
    # tie.  The Pallas path accumulates per-row sums in f32 (vs bf16 for
    # the scatter under compute_dtype=bf16); flip to "pallas" if gradient
    # precision matters more than graph simplicity.
    # "factor" (round 3) fuses gather+combine into one custom-VJP op whose
    # backward consumes the (w, dout) rank-1 factors directly: it permutes
    # a packed (N, 32)-byte factor array instead of the (N, 512)-byte
    # cotangent and rebuilds cotangent tiles inside the kernel (two
    # 0/1-placement MXU matmuls).  CONTRACT: zero gradient to sample
    # positions (true for the NGP train paths; BARF-style pose refinement
    # must not use it).
    table_grad: str = "auto"

    @property
    def latent_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def _resolutions(self):
        if self.n_levels == 1:
            return [self.base_resolution]
        growth = np.exp(
            (np.log(self.max_resolution) - np.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        return [
            int(np.floor(self.base_resolution * growth**l))
            for l in range(self.n_levels)
        ]

    @nn.compact
    def __call__(
        self, x: Array, paired_levels: int = 0, pair_chunk: int = 4
    ) -> Array:
        """``paired_levels > 0`` enables chunk-paired coarse encoding: the
        caller promises that each aligned run of ``pair_chunk`` consecutive
        samples is one straight in-order ray segment much shorter than the
        paired (coarsest) levels' cell size (see
        :func:`paired_safe_level_count`; :func:`traverse_and_compact` emits
        exactly such chunks).  Those levels are evaluated only at each
        chunk's first/last sample — half the gather indices at
        ``pair_chunk=4``, the dominant encoder cost on v5e — and interior
        samples linearly interpolate the two endpoint feature vectors along
        the chord (projection weight: exact for collinear points with any
        spacing).  Error is secant-small while a chunk stays inside one
        cell, and bounded by the feature scale for chunks straddling a cell
        boundary (the corner-fused layout is already discontinuous across
        cells).

        Measured design note (v5e, n=262k, L4F16): pairing wins ONLY in the
        forward pass (-25% with 2 paired levels); the backward's extra
        passes over ``(n, F=16)``-minor tensors (8x tile padding) cost ~4 ms
        more than the halved table-scatter saves, so training paths should
        keep ``paired_levels=0``.  Two alternative formulations measured
        worse: endpoint-select on full-width rows (lane-strided selects,
        ~100x pathological), and anchor-cell row broadcast (breaks the
        P0 graph's fusion, +4 ms per paired level in BOTH directions)."""
        T = 1 << self.log2_hashmap_size
        L, F = self.n_levels, self.n_features_per_level
        resolutions = self._resolutions()

        table = self.param(
            "table", nn.initializers.uniform(scale=2e-4), (L * T, 8 * F)
        )
        table_f32 = table - 1e-4
        cdt = self.compute_dtype

        from ..ops.table_grad import (
            hash_lookup_combine,
            hash_table_lookup_sized,
            on_tpu,
        )

        use_factor_grad = (
            8 * F == _LANE_WIDTH and self.table_grad == "factor"
        )
        use_pallas_grad = (
            8 * F == _LANE_WIDTH and self.table_grad == "pallas"
        )
        if use_pallas_grad:
            def lookup(idx, lvl0=0, k=1):
                return hash_table_lookup_sized(
                    table_f32, idx, compute_dtype=cdt,
                    interpret=not on_tpu(),
                    level_span=T, n_levels=k, level_base=lvl0,
                )
        else:
            # One whole-table cast per step (~0.2 ms at 67 MB) halves the
            # row-gather + combine traffic below; cell coords and trilinear
            # weights are still computed in f32 (only the feature math and
            # its backward drop precision).
            table_c = (
                table_f32 if cdt is None else table_f32.astype(cdt)
            )

            def lookup(idx, lvl0=0, k=1):
                return jnp.take(table_c, idx, axis=0)

        if isinstance(x, (tuple, list)):
            # SoA fast path: three 1-D component arrays (no (n, 3) tensor —
            # a 3-minor dim lane-pads 42x on TPU).
            xs, ys, zs = x
            batch_shape = xs.shape
            n = xs.shape[0]
            in_dtype = xs.dtype
        else:
            batch_shape = x.shape[:-1]
            n = int(np.prod(batch_shape)) if batch_shape else 1
            xs = x[..., 0].reshape(n)
            ys = x[..., 1].reshape(n)
            zs = x[..., 2].reshape(n)
            in_dtype = x.dtype

        def encode_levels(res_list, lvl0, xs_, ys_, zs_):
            """Per-level trilinear hash encode of points ``(m,)`` for levels
            ``lvl0 .. lvl0+k``; returns ``(k, m, F)`` (the P=0 math, on a
            level/point subset)."""
            k = len(res_list)
            m = xs_.shape[0]
            res = jnp.asarray(res_list, in_dtype)[:, None]
            xl = xs_[None, :] * res
            yl = ys_[None, :] * res
            zl = zs_[None, :] * res
            c0x = jnp.floor(xl)
            c0y = jnp.floor(yl)
            c0z = jnp.floor(zl)
            cx = c0x.astype(jnp.int32)
            cy = c0y.astype(jnp.int32)
            cz = c0z.astype(jnp.int32)
            wx = xl - c0x
            wy = yl - c0y
            wz = zl - c0z

            res_i = jnp.asarray(res_list, jnp.int32)[:, None]
            use_dense = res_i**3 <= T
            level_offset = (
                (lvl0 + jnp.arange(k, dtype=jnp.int32)) * T
            )[:, None]
            dense_idx = (cx * res_i + cy) * res_i + cz
            h = (
                (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
                ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
                ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
            ) & jnp.uint32(T - 1)
            idx = jnp.where(
                use_dense, dense_idx & (T - 1), h.astype(jnp.int32)
            )
            idx = (idx + level_offset).reshape(-1)  # (k*m,)
            g = None if use_factor_grad else lookup(idx, lvl0, k)  # (k*m, 8F)

            # Trilinear combine: weights (k, m) per corner, applied to the
            # row-gathered features via a batched (1,8)x(8,F) contraction.
            # A lane-aligned reformulation (corner weights expanded to the
            # full (km, 8F) row via iota masks + MXU 0/1-matrix corner sum,
            # hypothesizing the einsum's (km, 8, F) cotangent tile-padding
            # dominated the backward) measured WORSE: encoder fwd+bwd
            # 49.9 -> 56.5 ms at 2M sample-levels on v5e — XLA already
            # fuses the outer-product cotangent into the table scatter, and
            # the explicit (km, 8F) weight/product tensors add ~1 GB of
            # real traffic.  Fourth restructuring loss against this graph;
            # keep the einsum.
            w = jnp.stack(
                [
                    (wx if dx else 1.0 - wx)
                    * (wy if dy else 1.0 - wy)
                    * (wz if dz else 1.0 - wz)
                    for dx in (0, 1)
                    for dy in (0, 1)
                    for dz in (0, 1)
                ],
                axis=-1,
            )  # (k, m, 8)
            if cdt is not None:
                w = w.astype(cdt)
            if use_factor_grad:
                # Fused gather+combine whose backward consumes (w, dout)
                # factors directly — no (k*m, 128) cotangent is ever
                # materialized or permuted (ops/table_grad.py factor path).
                # Contract: zero gradient to w (positions carry no grad in
                # the NGP training paths this encoder serves).
                # NERFACC_FACTOR_PACK=w3 (the DEFAULT since the round-4
                # device A/B: 10.87M vs 9.58M samples/s end-to-end; w8
                # stays as the fallback) carries only the three fractional
                # weights through the backward's sort (11 int32 operands vs
                # 17) and rebuilds the 8 corner weights in-kernel — sort
                # cost is ~linear in operand count (round-4 trace).
                if os.environ.get("NERFACC_FACTOR_PACK", "u10") in (
                    "w3", "u10",
                ):
                    from ..ops.table_grad import hash_lookup_combine3

                    out = hash_lookup_combine3(
                        table_f32, idx,
                        wx.reshape(k * m), wy.reshape(k * m),
                        wz.reshape(k * m),
                        compute_dtype=cdt, interpret=not on_tpu(),
                        level_span=T, n_levels=k, level_base=lvl0,
                    )
                else:
                    out = hash_lookup_combine(
                        table_f32, idx, w.reshape(k * m, 8),
                        compute_dtype=cdt, interpret=not on_tpu(),
                        level_span=T, n_levels=k, level_base=lvl0,
                    )
                return out.reshape(k, m, F)
            out = jnp.einsum(
                "kc,kcf->kf",
                w.reshape(k * m, 8),
                g.reshape(k * m, 8, F),
            )  # (k*m, F)
            return out.reshape(k, m, F)

        P = int(paired_levels)
        if P > 0 and (n % pair_chunk != 0 or P > L):
            P = 0
        if P:
            C = pair_chunk
            nc = n // C

            def endpoints(a):  # (n,) -> (2*nc,) [chunk firsts; chunk lasts]
                a2 = a.reshape(nc, C)
                return jnp.concatenate([a2[:, 0], a2[:, C - 1]], axis=0)

            xe, ye, ze = endpoints(xs), endpoints(ys), endpoints(zs)
            oe = encode_levels(resolutions[:P], 0, xe, ye, ze)  # (P, 2nc, F)

            def chunk_bcast(a):  # (nc,) -> (n,)
                return jnp.broadcast_to(a[:, None], (nc, C)).reshape(n)

            # Per-sample chord projection u in [0, 1] (exact for collinear
            # chunk points; degenerate chords collapse to the first point).
            dx0 = xs - chunk_bcast(xe[:nc])
            dy0 = ys - chunk_bcast(ye[:nc])
            dz0 = zs - chunk_bcast(ze[:nc])
            cxv = chunk_bcast(xe[nc:] - xe[:nc])
            cyv = chunk_bcast(ye[nc:] - ye[:nc])
            czv = chunk_bcast(ze[nc:] - ze[:nc])
            den = cxv * cxv + cyv * cyv + czv * czv
            u = (dx0 * cxv + dy0 * cyv + dz0 * czv) / jnp.maximum(den, 1e-12)
            u = jnp.clip(u, 0.0, 1.0)
            if cdt is not None:
                u = u.astype(cdt)

            ff = jnp.broadcast_to(
                oe[:, :nc, None, :], (P, nc, C, F)
            ).reshape(P, n, F)
            fl = jnp.broadcast_to(
                oe[:, nc:, None, :], (P, nc, C, F)
            ).reshape(P, n, F)
            out_p = ff + (fl - ff) * u[None, :, None]  # (P, n, F)

            out_rest = encode_levels(resolutions[P:], P, xs, ys, zs)
            out = jnp.concatenate([out_p, out_rest], axis=0)  # (L, n, F)
        else:
            out = encode_levels(resolutions, 0, xs, ys, zs)

        out = jnp.transpose(out, (1, 0, 2))  # (n, L, F)
        return out.reshape(batch_shape + (L * F,))


class HashGridEncoderGrouped(nn.Module):
    """Multi-level-packed hash encoding for the reference's tcnn shape
    (16 levels x 2 features, ``ngp.py:99-137``): ONE gather serves
    ``J = 128 // (8*F)`` consecutive levels.

    The tcnn-parity encoders evaluate 8 corners x L levels x F features
    per sample as separate scalar gathers — at 16Lx2F that is 64x the
    index count of the corner-fused L4F16 layout, and XLA's TPU gather
    costs ~7 ns per INDEX regardless of row width (measured on v5e), so
    the exact parameterization runs ~60x slower end-to-end.  This encoder
    extends the corner-fused trade to the level axis: a 128-lane table
    row holds ``J`` sub-levels x 8 corners x ``F`` features (lane
    ``l`` = corner ``l // (J*F)``, sub-level ``(l % (J*F)) // F``,
    feature ``l % F``), keyed by the cell of the GROUP'S FINEST level;
    each sub-level contributes its own trilinear weights computed at its
    own resolution from the shared sample position.  At 16Lx2F that is
    TWO gathers per sample instead of 256 scalar ones.

    Trade-off (same class as :class:`HashGridEncoderFused`'s corner
    fusion, documented there): within a group, coarser sub-levels'
    features are stored at the finest key grid's granularity, so their
    cross-cell smoothness comes from the interpolation weights and the
    MLP rather than from storage sharing.  Parameter count matches the
    reference exactly when ``log2_hashmap_size`` is 3 less than tcnn's
    (same 8x-corners rule as the fused encoder; ``NGPRadianceField``
    applies it automatically): 16L x 2F x 2^19 tcnn entries == 2 groups
    x 2^16 rows x 128 lanes == 16.7M params either way.

    The backward (``table_grad="factor"``) carries the raw f32 sample
    positions through the compaction sort — 3 operands for ALL ``J``
    sub-levels' weights, vs ``J`` packed weight words — and recomputes
    every frac in-kernel from compile-time resolutions
    (:func:`~nerfacc_tpu.ops.table_grad.table_grad_factors_sorted_pos`).
    Zero gradient to positions BY CONTRACT on that path."""

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 16
    base_resolution: int = 16
    max_resolution: int = 4096
    compute_dtype: Optional[jnp.dtype] = None
    table_grad: str = "factor"
    # SPLIT-KEY rows: each 128-lane row holds J sub-levels, fetched in
    # ``keys_per_row`` independent windows of J/keys_per_row sub-levels,
    # each keyed by its OWN grid — two fetches with different keys share
    # one row (disjoint lane sets), so the encoder gets G*keys_per_row
    # real key grids (a fused-class multiresolution ladder) at tcnn's
    # exact parameter count.  Measured necessity (CPU repro, 160x160
    # proxy, 300 steps): single finest-key rows DIVERGE (14.2 dB — the
    # coarse levels ride a heavily-colliding fine grid, so no clean
    # coarse channel exists), a collision-capped single key stalls at
    # 17.3 dB (sub-levels finer than the key only contribute periodic
    # textures), while the fused 4-grid ladder reaches 32.2 dB — 4 key
    # grids is the structural requirement.  With CONTINUOUS triangle-wave
    # weights on non-key sub-levels (NERFACC_GROUPED_WB, default tri) the
    # measured ladder on that repro is: split=2 22.8 dB, split=4 30.4,
    # split=8 (pure per-level corner-fused) 29.7, fused 32.2, exact hash
    # 34.3 — keys_per_row=4 is the quality/speed knee (8 fetches/sample
    # vs the fused flagship's 4).
    keys_per_row: int = 4
    # Per-window key grid: the FINEST level in the window whose cell
    # count stays within ``key_collision_cap * table_rows`` (an
    # Instant-NGP-like collision budget), falling back to the window's
    # finest level when none qualifies (fine windows — heavy collisions
    # on the finest grid are what NGP hash levels already live with).
    key_collision_cap: float = 16.0

    @property
    def latent_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def sub_levels(self) -> int:
        return _LANE_WIDTH // (8 * self.n_features_per_level)

    def _resolutions(self):
        return grid_resolutions(
            self.n_levels, self.base_resolution, self.max_resolution
        )

    def _split(self) -> int:
        sp = int(os.environ.get("NERFACC_GROUPED_SPLIT", self.keys_per_row))
        return sp if self.sub_levels % sp == 0 else 1

    def fetch_key_levels(self):
        """Per-fetch key level indices under the collision-budget rule.
        NERFACC_GROUPED_KEYCAP overrides the cap (A/B; 0 = window-finest
        keys), NERFACC_GROUPED_SPLIT the keys_per_row."""
        cap = float(
            os.environ.get("NERFACC_GROUPED_KEYCAP", self.key_collision_cap)
        )
        T = 1 << self.log2_hashmap_size
        Jg = self.sub_levels // self._split()
        res = self._resolutions()
        keys = []
        for lg in range(self.n_levels // Jg):
            lvls = list(range(lg * Jg, (lg + 1) * Jg))
            ok = [
                l for l in lvls
                if (res[l] + 1) ** 3 <= cap * T
            ]
            keys.append(max(ok) if ok else lvls[-1])
        return keys

    @nn.compact
    def __call__(self, x) -> Array:
        T = 1 << self.log2_hashmap_size
        L, F = self.n_levels, self.n_features_per_level
        J = self.sub_levels
        assert 8 * F * J == _LANE_WIDTH
        assert L % J == 0, (
            f"grouped encoder needs n_levels % {J} == 0 at F={F}"
        )
        G = L // J
        split = self._split()
        Jg = J // split
        LG = G * split
        resolutions = self._resolutions()

        table = self.param(
            "table", nn.initializers.uniform(scale=2e-4), (G * T, _LANE_WIDTH)
        )
        table_f32 = table - 1e-4
        cdt = self.compute_dtype

        from ..ops.table_grad import hash_lookup_combine_pos, on_tpu

        if isinstance(x, (tuple, list)):
            xs, ys, zs = x
            batch_shape = xs.shape
            n = xs.shape[0]
            in_dtype = xs.dtype
        else:
            batch_shape = x.shape[:-1]
            n = int(np.prod(batch_shape)) if batch_shape else 1
            xs = x[..., 0].reshape(n)
            ys = x[..., 1].reshape(n)
            zs = x[..., 2].reshape(n)
            in_dtype = x.dtype

        # Per-fetch keys under the collision-budget rule (class docstring);
        # fetch lg covers levels [lg*Jg, (lg+1)*Jg) = span lg//split,
        # sub-level window (lg%split)*Jg of the row.
        key_lvls = self.fetch_key_levels()
        fetch_spec = tuple(
            (
                lg // split,
                (lg % split) * Jg,
                Jg,
                tuple(resolutions[lg * Jg + k] for k in range(Jg)),
                key_lvls[lg] - lg * Jg,  # key's index within the window
            )
            for lg in range(LG)
        )
        key_res = [resolutions[l] for l in key_lvls]
        res_i = jnp.asarray(key_res, jnp.int32)[:, None]  # (LG, 1)
        res_f = jnp.asarray(key_res, in_dtype)[:, None]
        cx = jnp.floor(xs[None, :] * res_f).astype(jnp.int32)  # (LG, n)
        cy = jnp.floor(ys[None, :] * res_f).astype(jnp.int32)
        cz = jnp.floor(zs[None, :] * res_f).astype(jnp.int32)
        use_dense = res_i**3 <= T
        span_offset = (
            (jnp.arange(LG, dtype=jnp.int32) // split) * T
        )[:, None]
        dense_idx = (cx * res_i + cy) * res_i + cz
        h = (
            (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
            ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
            ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
        ) & jnp.uint32(T - 1)
        idx = jnp.where(use_dense, dense_idx & (T - 1), h.astype(jnp.int32))
        idx = (idx + span_offset).reshape(-1)  # (LG*n,) fetch-major

        out = hash_lookup_combine_pos(
            table_f32, idx,
            xs.astype(jnp.float32), ys.astype(jnp.float32),
            zs.astype(jnp.float32),
            fetch_spec, F=F,
            compute_dtype=cdt, interpret=not on_tpu(),
            level_span=T,
            grad_mode=("factor" if self.table_grad == "factor"
                       else "scatter"),
        )  # (LG*n, Jg*F)
        # Per-fetch (n, Jg*F) blocks concatenated on features = level-major
        # (n, L*F) output, matching the tcnn feature ordering — no
        # minor-dim transpose is ever materialized.
        out = jnp.concatenate(
            [out[lg * n : (lg + 1) * n] for lg in range(LG)], axis=1
        )
        return out.reshape(batch_shape + (L * F,))


class HashGridEncoderFolded(nn.Module):
    """Corner-fused hash encoding with the trilinear combine FOLDED into the
    consumer matmul (the fast path; v5e-measured redesign of
    :class:`HashGridEncoderFused`).

    The fused encoder's post-gather combine (``einsum (k,8) x (k,8,F)`` +
    level transpose) materializes ``(L*n, 8, F)``/``(L, n, F)``
    intermediates whose minor dims (16, 8) tile-pad up to 16x on TPU — at
    the flagship config that combine chain costs more than the gather
    itself.  Here the encoder instead returns the gathered corner rows
    *pre-multiplied by their trilinear weights*, laid out ``(n, L*8*F)``
    lane-aligned (128-wide per-level blocks, zero padding), and the first
    MLP layer contracts over corners and features in ONE MXU matmul.  With
    weights per (corner, feature) untied this strictly generalizes
    ``W1 @ trilerp(corners)`` — equality is recovered by tying W1 rows
    across corners (see ``test_folded_ties_to_fused``).

    Everything before the gather is computed sample-major ``(n, L)`` and
    fuses into the index computation / mask multiply without touching HBM;
    the only materialized tensors are the flat index vector and the
    ``(n, L*8F)`` output that feeds the matmul.

    Replaces the same tiny-cuda-nn surface as the other encoders
    (``examples/radiance_fields/ngp.py:99-137``).
    """

    n_levels: int = 8
    n_features_per_level: int = 16
    log2_hashmap_size: int = 15
    base_resolution: int = 16
    max_resolution: int = 4096

    @property
    def latent_dim(self) -> int:
        return self.n_levels * 8 * self.n_features_per_level

    def _resolutions(self):
        if self.n_levels == 1:
            return [self.base_resolution]
        growth = np.exp(
            (np.log(self.max_resolution) - np.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        return [
            int(np.floor(self.base_resolution * growth**l))
            for l in range(self.n_levels)
        ]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        T = 1 << self.log2_hashmap_size
        L, F = self.n_levels, self.n_features_per_level
        resolutions = self._resolutions()

        table = self.param(
            "table", nn.initializers.uniform(scale=2e-4), (L * T, 8 * F)
        )
        table = table - 1e-4

        batch_shape = x.shape[:-1]
        n = int(np.prod(batch_shape)) if batch_shape else 1
        xs = x[..., 0].reshape(n)
        ys = x[..., 1].reshape(n)
        zs = x[..., 2].reshape(n)

        # Sample-major (n, L) index math -> flat (n*L,) indices so the
        # gathered rows land directly in (n, L*8F) layout (no transpose).
        res = jnp.asarray(resolutions, x.dtype)[None, :]
        xl, yl, zl = xs[:, None] * res, ys[:, None] * res, zs[:, None] * res
        c0x, c0y, c0z = jnp.floor(xl), jnp.floor(yl), jnp.floor(zl)
        cx = c0x.astype(jnp.int32)
        cy = c0y.astype(jnp.int32)
        cz = c0z.astype(jnp.int32)

        res_i = jnp.asarray(resolutions, jnp.int32)[None, :]
        use_dense = res_i**3 <= T
        level_offset = (jnp.arange(L, dtype=jnp.int32) * T)[None, :]
        dense_idx = (cx * res_i + cy) * res_i + cz
        h = (
            (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
            ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
            ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
        ) & jnp.uint32(T - 1)
        idx = jnp.where(use_dense, dense_idx & (T - 1), h.astype(jnp.int32))
        idx = (idx + level_offset).reshape(-1)  # (n*L,) sample-major

        g = jnp.take(table, idx, axis=0).reshape(n, L * 8 * F)

        # Per-level corner-weight blocks (n, 8F), lane pattern c*F+f with
        # corner bits c = (dx<<2 | dy<<1 | dz); all elementwise + broadcast,
        # fused by XLA into the mask multiply.
        lane_c = jnp.arange(8 * F, dtype=jnp.int32) // F
        bx = (lane_c >> 2) & 1
        by = (lane_c >> 1) & 1
        bz = lane_c & 1
        blocks = []
        for lvl in range(L):
            wx = (xl - c0x)[:, lvl : lvl + 1]  # (n, 1)
            wy = (yl - c0y)[:, lvl : lvl + 1]
            wz = (zl - c0z)[:, lvl : lvl + 1]
            m = (
                jnp.where(bx[None, :] == 1, wx, 1.0 - wx)
                * jnp.where(by[None, :] == 1, wy, 1.0 - wy)
                * jnp.where(bz[None, :] == 1, wz, 1.0 - wz)
            )
            blocks.append(m)
        mask = jnp.concatenate(blocks, axis=-1)  # (n, L*8F)
        out = g * mask
        return out.reshape(batch_shape + (L * 8 * F,))
