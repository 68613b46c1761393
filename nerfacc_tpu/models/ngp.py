"""Instant-NGP radiance/density fields (hash grid + fused small MLPs).

Parity target: ``examples/radiance_fields/ngp.py`` (which delegates to
tiny-cuda-nn).  The TPU equivalents: :class:`~.encoding.HashGridEncoder`
(gather + autodiff scatter-add) and plain ``nn.Dense`` 64-wide MLPs — at
these widths XLA fuses the whole head into a couple of MXU ops, which is the
TPU analogue of tcnn's FullyFusedMLP.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoding import HashGridEncoder, spherical_harmonics_deg4
from .hash_soa import (
    HashGridEncoderFolded,
    HashGridEncoderFused,
    HashGridEncoderGrouped,
    HashGridEncoderSoA,
)

_ENCODERS = {
    "hash": HashGridEncoder,
    "soa": HashGridEncoderSoA,
    "fused": HashGridEncoderFused,
    "folded": HashGridEncoderFolded,
    "grouped": HashGridEncoderGrouped,
}

Array = jnp.ndarray


@jax.custom_vjp
def trunc_exp(x: Array) -> Array:
    """exp with clamped-input gradient (``ngp.py:23-39``)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def contract_tanh(x: Array, aabb: Array) -> Array:
    """Per-axis tanh contraction to [0,1]^3; the roi maps to
    [~0.27, ~0.73]^3 (``utils_contraction.cuh:33-61`` UN_BOUNDED_TANH;
    inverse = atanh, see :func:`contract_tanh_inv`)."""
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    u = (x - aabb_min) / (aabb_max - aabb_min) - 0.5
    return jnp.tanh(u) * 0.5 + 0.5


def contract_tanh_inv(x: Array, aabb: Array) -> Array:
    """Inverse of :func:`contract_tanh` (``utils_contraction.cuh:45-61``)."""
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    u = jnp.arctanh(jnp.clip(x * 2.0 - 1.0, -1.0 + 1e-7, 1.0 - 1e-7))
    return (u + 0.5) * (aabb_max - aabb_min) + aabb_min


def contract_to_unisphere(
    x: Array, aabb: Array, ord: Union[str, int] = 2, eps: float = 1e-6
) -> Array:
    """MipNeRF-360 scene contraction to [0,1]^3 (``ngp.py:42-66``)."""
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    x = (x - aabb_min) / (aabb_max - aabb_min)
    x = x * 2 - 1  # aabb at [-1, 1]
    mag = jnp.linalg.norm(x, ord=ord, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, eps)
    contracted = (2 - 1 / mag) * (x / mag)
    x = jnp.where(mag > 1, contracted, x)
    return x / 4 + 0.5  # [-inf, inf] -> [0, 1]


class NGPRadianceField(nn.Module):
    """Hash-grid radiance field (``ngp.py:69-210``)."""

    aabb: Sequence[float]
    num_dim: int = 3
    use_viewdirs: bool = True
    unbounded: bool = False
    base_resolution: int = 16
    max_resolution: int = 4096
    geo_feat_dim: int = 15
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    mlp_width: int = 64
    encoder_type: str = "fused"
    param_dtype: jnp.dtype = jnp.float32
    # Optional low-precision compute (jnp.bfloat16): params stay f32 (flax
    # casts at use; adam runs full precision), the encoder table/combine and
    # both MLPs compute in bf16, and density/rgb activations are applied in
    # f32.  Matches the numerics class of tcnn's fp16 training path.
    compute_dtype: Optional[jnp.dtype] = None
    # Hash-table gradient strategy (fused encoder): see
    # HashGridEncoderFused.table_grad.  "factor" (the default since the
    # round-3 device A/B: 9.54M vs 8.02M samples/s on v5e) consumes the
    # (w, dout) rank-1 factors directly in a Pallas sorted reduction and
    # returns ZERO gradient to sample positions — correct for every NGP
    # training path here (positions come from rays and stop-gradient
    # traversal).  Set "scatter" if you differentiate positions through
    # this field (e.g. pose refinement; BARF uses the parity encoders).
    table_grad: str = "factor"

    def setup(self):
        # The fused encoder stores 8 corners per row; drop its per-level entry
        # count 8x so the parameter budget matches the reference layout
        # (2^19 entries x 2 feats == 2^16 rows x 8 corners x 2 feats).
        # Corner-per-row encoders (fused/folded) store 8 corners per entry;
        # drop their per-level entry count 8x so the parameter budget matches
        # the reference layout (2^19 x 2 == 2^16 rows x 8 corners x 2).
        log2_t = self.log2_hashmap_size - (
            3 if self.encoder_type in ("fused", "folded", "grouped") else 0
        )
        enc_kwargs = dict(
            n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=log2_t,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
        )
        if self.encoder_type in ("fused", "grouped"):
            if self.compute_dtype is not None:
                enc_kwargs["compute_dtype"] = self.compute_dtype
            enc_kwargs["table_grad"] = self.table_grad
        self.encoder = _ENCODERS[self.encoder_type](**enc_kwargs)
        self.mlp_base = nn.Sequential(
            [
                nn.Dense(self.mlp_width, dtype=self.compute_dtype),
                nn.relu,
                nn.Dense(1 + self.geo_feat_dim, dtype=self.compute_dtype),
            ]
        )
        if self.geo_feat_dim > 0:
            self.mlp_head = nn.Sequential(
                [
                    nn.Dense(self.mlp_width, dtype=self.compute_dtype),
                    nn.relu,
                    nn.Dense(self.mlp_width, dtype=self.compute_dtype),
                    nn.relu,
                    nn.Dense(3, dtype=self.compute_dtype),
                ]
            )

    def _density_activation(self, x: Array) -> Array:
        return trunc_exp(x - 1)

    def paired_safe_levels(
        self, step_size: float, chunk: int = 4, margin: float = 2.0
    ) -> int:
        """Coarsest-level count safe for the fused encoder's chunk-paired
        gathers given a world-space marching ``step_size`` (0 for encoders
        without the optimization).  See
        :meth:`HashGridEncoderFused.paired_safe_levels`."""
        if self.encoder_type != "fused":
            return 0
        from .hash_soa import grid_resolutions, paired_safe_level_count

        aabb = np.asarray(self.aabb, np.float32)
        span = float(step_size / (aabb[3:] - aabb[:3]).min())
        return paired_safe_level_count(
            grid_resolutions(
                self.n_levels, self.base_resolution, self.max_resolution
            ),
            span,
            chunk=chunk,
            margin=margin,
        )

    def query_density(
        self, x: Array, return_feat: bool = False, paired_levels: int = 0
    ):
        """``x``: positions ``(..., 3)``, or an ``(xs, ys, zs)`` tuple of 1-D
        component arrays (SoA fast path, fused encoder only): position math
        stays 1-D end-to-end, skipping the 42x lane padding that any
        ``(n, 3)`` intermediate pays on TPU."""
        aabb = jnp.asarray(self.aabb, jnp.float32)
        if isinstance(x, (tuple, list)):
            assert self.encoder_type in ("fused", "grouped"), (
                "SoA input needs the fused or grouped encoder"
            )
            xs, ys, zs = x
            lo, hi = aabb[:3], aabb[3:]
            ux = (xs - lo[0]) / (hi[0] - lo[0])
            uy = (ys - lo[1]) / (hi[1] - lo[1])
            uz = (zs - lo[2]) / (hi[2] - lo[2])
            if self.unbounded:
                # contract_to_unisphere, per component (ord=2).
                cx, cy, cz = ux * 2 - 1, uy * 2 - 1, uz * 2 - 1
                mag = jnp.maximum(
                    jnp.sqrt(cx * cx + cy * cy + cz * cz), 1e-6
                )
                scale = jnp.where(mag > 1, (2 - 1 / mag) / mag, 1.0)
                ux = cx * scale / 4 + 0.5
                uy = cy * scale / 4 + 0.5
                uz = cz * scale / 4 + 0.5
            selector = (
                (ux > 0.0) & (ux < 1.0)
                & (uy > 0.0) & (uy < 1.0)
                & (uz > 0.0) & (uz < 1.0)
            )
            u = (ux, uy, uz)
        else:
            if self.unbounded:
                u = contract_to_unisphere(x, aabb)
            else:
                u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
            selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        if paired_levels and self.encoder_type == "fused":
            h = self.encoder(u, paired_levels=paired_levels)
        else:
            h = self.encoder(u)
        h = self.mlp_base(h)
        density_before, feat = h[..., :1], h[..., 1:]
        density = (
            self._density_activation(density_before.astype(jnp.float32))
            * selector[..., None]
        )
        if return_feat:
            return density, feat
        return density

    def _query_rgb(self, direction: Optional[Array], embedding: Array):
        if self.use_viewdirs and direction is not None:
            d = spherical_harmonics_deg4(direction)
            h = jnp.concatenate([d.astype(embedding.dtype), embedding], axis=-1)
        else:
            h = embedding
        return nn.sigmoid(self.mlp_head(h).astype(jnp.float32))

    def __call__(
        self,
        positions: Array,
        directions: Optional[Array] = None,
        paired_levels: int = 0,
    ):
        density, embedding = self.query_density(
            positions, return_feat=True, paired_levels=paired_levels
        )
        rgb = self._query_rgb(directions, embedding)
        return rgb, density


class NGPDensityField(nn.Module):
    """Hash-grid density-only field for proposal levels (``ngp.py:213-279``)."""

    aabb: Sequence[float]
    num_dim: int = 3
    unbounded: bool = False
    base_resolution: int = 16
    max_resolution: int = 128
    n_levels: int = 5
    n_features_per_level: int = 2
    log2_hashmap_size: int = 17
    mlp_width: int = 64
    encoder_type: str = "fused"
    # See NGPRadianceField.compute_dtype (bf16 mixed precision).
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        log2_t = self.log2_hashmap_size - (
            3 if self.encoder_type in ("fused", "folded", "grouped") else 0
        )
        enc_kwargs = dict(
            n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=log2_t,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
        )
        if self.compute_dtype is not None and self.encoder_type in (
            "fused", "grouped",
        ):
            enc_kwargs["compute_dtype"] = self.compute_dtype
        self.encoder = _ENCODERS[self.encoder_type](**enc_kwargs)
        self.mlp_base = nn.Sequential(
            [
                nn.Dense(self.mlp_width, dtype=self.compute_dtype),
                nn.relu,
                nn.Dense(1, dtype=self.compute_dtype),
            ]
        )

    def __call__(self, positions: Array) -> Array:
        aabb = jnp.asarray(self.aabb, jnp.float32)
        if self.unbounded:
            u = contract_to_unisphere(positions, aabb)
        else:
            u = (positions - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        h = self.mlp_base(self.encoder(u))
        return trunc_exp(h.astype(jnp.float32) - 1) * selector[..., None]
