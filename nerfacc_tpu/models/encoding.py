"""Multiresolution hash-grid encoding + spherical-harmonics view encoding.

This is the TPU-native replacement for the reference's out-of-repo native
dependency **tiny-cuda-nn** (``examples/radiance_fields/ngp.py:12-19``):
a hash-grid encoder (16 levels, 2 features, 2^19 table, geometric growth)
and an SH-degree-4 direction encoding.

TPU design: the forward is one batched gather from a ``(L*T, F)`` table plus
trilinear weighting — XLA lowers it to a vectorized HBM gather; the backward
(table gradient) is the transpose scatter-add, which JAX autodiff derives
from ``take`` automatically (the CUDA version hand-writes atomicAdd loops).
All 16 levels are processed in one vectorized pass (no per-level loop).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

# tcnn's spatial hash primes.
_PRIMES = (1, 2654435761, 805459861)


class HashGridEncoder(nn.Module):
    """Multiresolution hash encoding (Instant-NGP).

    Levels with ``(res+1)^3 <= table_size`` are stored densely (tcnn does the
    same); finer levels use the xor-prime spatial hash.
    """

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
        """``x``: (..., 3) in [0, 1].  Returns (..., L*F)."""
        T = 1 << self.log2_hashmap_size
        L, F = self.n_levels, self.n_features_per_level
        resolutions = self._resolutions()

        table = self.param(
            "table",
            nn.initializers.uniform(scale=2e-4),  # tcnn init: U(-1e-4, 1e-4)
            (L * T, F),
        )
        # Shift to zero-mean as in tcnn.
        table = table - 1e-4

        batch_shape = x.shape[:-1]
        xf = x.reshape(-1, 3)
        n = xf.shape[0]

        res = jnp.asarray(resolutions, jnp.float32)  # (L,)
        xl = xf[:, None, :] * res[None, :, None]  # (N, L, 3)
        c0 = jnp.floor(xl)
        w = xl - c0  # (N, L, 3) trilinear weights
        c0 = c0.astype(jnp.int32)

        # 8 corner offsets.
        corners = jnp.asarray(
            [
                [i, j, k]
                for i in (0, 1)
                for j in (0, 1)
                for k in (0, 1)
            ],
            jnp.int32,
        )  # (8, 3)
        cc = c0[:, :, None, :] + corners[None, None, :, :]  # (N, L, 8, 3)

        # Per-level index: dense when the level fits the table, hashed else.
        res_i = jnp.asarray(resolutions, jnp.int32)
        n_dense = (res_i + 1) ** 3
        use_dense = (n_dense <= T)[None, :, None]  # (1, L, 1)
        stride = (res_i + 1)[None, :, None]
        dense_idx = (
            cc[..., 0] * stride * stride + cc[..., 1] * stride + cc[..., 2]
        )
        ccu = cc.astype(jnp.uint32)
        hash_idx = (
            (ccu[..., 0] * jnp.uint32(_PRIMES[0]))
            ^ (ccu[..., 1] * jnp.uint32(_PRIMES[1]))
            ^ (ccu[..., 2] * jnp.uint32(_PRIMES[2]))
        ) & jnp.uint32(T - 1)
        hash_idx = hash_idx.astype(jnp.int32)
        idx = jnp.where(use_dense, dense_idx & (T - 1), hash_idx)  # (N, L, 8)

        level_offset = (jnp.arange(L, dtype=jnp.int32) * T)[None, :, None]
        flat_idx = idx + level_offset

        feats = jnp.take(table, flat_idx.reshape(-1), axis=0).reshape(
            n, L, 8, F
        )

        # Trilinear interpolation; corner weight = prod over dims of
        # (w if corner==1 else 1-w).
        cw = jnp.where(
            corners[None, None, :, :] == 1, w[:, :, None, :], 1.0 - w[:, :, None, :]
        ).prod(axis=-1)  # (N, L, 8)
        out = jnp.sum(feats * cw[..., None], axis=2)  # (N, L, F)
        return out.reshape(batch_shape + (L * F,))


def spherical_harmonics_deg4(d: Array) -> Array:
    """Real SH basis up to degree 4 (16 coefficients), matching tcnn's
    ``SphericalHarmonics`` view encoding (hard-coded polynomial basis).

    ``d``: (..., 3) unit directions in [-1, 1], or an ``(x, y, z)`` tuple of
    1-D component arrays (SoA fast path — avoids the 42x lane padding of a
    3-minor tensor on TPU).  Returns (..., 16).
    """
    if isinstance(d, (tuple, list)):
        x, y, z = d
    else:
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    return jnp.stack(
        [
            jnp.full_like(x, 0.28209479177387814),  # l0
            -0.48860251190291987 * y,  # l1
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,  # l2
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
            0.59004358992664352 * y * (-3.0 * xx + yy),  # l3
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ],
        axis=-1,
    )
