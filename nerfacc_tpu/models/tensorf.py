"""TensoRF (VM decomposition) and K-Planes radiance fields.

Parity target: the reference's ``benchmarks/{tensorf,kplanes}`` git
submodules (forked third-party repos with nerfacc patched in,
``.gitmodules:6-24``).  Rather than vendoring foreign codebases, the field
families themselves are provided natively so the estimator/rendering stack
accelerates them exactly as the reference's plug-ins do.

TPU notes: plane/line features are gathered with bilinear/linear
interpolation — per-sample index counts are far lower than a hash grid
(3 planes x 4 corners), and the fusion MLP runs on the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ngp import trunc_exp

Array = jnp.ndarray

# axis pairs for the three planes (matij) and their complementary lines
_PLANE_AXES = ((0, 1), (0, 2), (1, 2))
_LINE_AXES = (2, 1, 0)


def _interp_plane(plane: Array, u: Array, v: Array) -> Array:
    """Bilinear sample of ``plane`` (R0, R1, C) at continuous (u, v) in [0,1].

    Returns (..., C).  SoA-friendly: u, v are separate 1-D arrays.
    """
    r0, r1, c = plane.shape
    x = jnp.clip(u * (r0 - 1), 0, r0 - 1)
    y = jnp.clip(v * (r1 - 1), 0, r1 - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r0 - 1)
    y1 = jnp.minimum(y0 + 1, r1 - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    flat = plane.reshape(r0 * r1, c)
    f00 = jnp.take(flat, x0 * r1 + y0, axis=0)
    f01 = jnp.take(flat, x0 * r1 + y1, axis=0)
    f10 = jnp.take(flat, x1 * r1 + y0, axis=0)
    f11 = jnp.take(flat, x1 * r1 + y1, axis=0)
    return (
        f00 * (1 - wx) * (1 - wy)
        + f01 * (1 - wx) * wy
        + f10 * wx * (1 - wy)
        + f11 * wx * wy
    )


def _interp_line(line: Array, u: Array) -> Array:
    """Linear sample of ``line`` (R, C) at u in [0,1] -> (..., C)."""
    r = line.shape[0]
    x = jnp.clip(u * (r - 1), 0, r - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r - 1)
    w = (x - x0)[..., None]
    return jnp.take(line, x0, axis=0) * (1 - w) + jnp.take(line, x1, axis=0) * w


class TensoRFRadianceField(nn.Module):
    """TensoRF-VM: density/appearance as sums of plane x line products."""

    aabb: Sequence[float]
    resolution: int = 128
    density_components: int = 8
    appearance_components: int = 24
    appearance_dim: int = 27
    mlp_width: int = 128

    def setup(self):
        R = self.resolution
        init = nn.initializers.normal(0.1)
        self.density_planes = [
            self.param(f"dp{i}", init, (R, R, self.density_components))
            for i in range(3)
        ]
        self.density_lines = [
            self.param(f"dl{i}", init, (R, self.density_components))
            for i in range(3)
        ]
        self.app_planes = [
            self.param(f"ap{i}", init, (R, R, self.appearance_components))
            for i in range(3)
        ]
        self.app_lines = [
            self.param(f"al{i}", init, (R, self.appearance_components))
            for i in range(3)
        ]
        self.basis_mat = nn.Dense(self.appearance_dim, use_bias=False)
        self.rgb_mlp = nn.Sequential(
            [
                nn.Dense(self.mlp_width),
                nn.relu,
                nn.Dense(self.mlp_width),
                nn.relu,
                nn.Dense(3),
            ]
        )

    def _normalize(self, x: Array) -> Tuple[Array, Array]:
        aabb = jnp.asarray(self.aabb, jnp.float32)
        u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        return jnp.clip(u, 0.0, 1.0), selector

    def _vm_features(self, u, planes, lines):
        us = [u[..., 0], u[..., 1], u[..., 2]]
        feats = []
        for i, ((a, b), l) in enumerate(zip(_PLANE_AXES, _LINE_AXES)):
            pf = _interp_plane(planes[i], us[a], us[b])
            lf = _interp_line(lines[i], us[l])
            feats.append(pf * lf)
        return feats

    def query_density(self, x: Array, return_feat: bool = False):
        u, selector = self._normalize(x)
        feats = self._vm_features(u, self.density_planes, self.density_lines)
        sigma_feat = sum(f.sum(-1) for f in feats)
        density = nn.softplus(sigma_feat + 0.1)[..., None] * selector[..., None]
        if return_feat:
            return density, None
        return density

    def _query_rgb(self, u: Array, direction: Optional[Array]):
        feats = jnp.concatenate(
            self._vm_features(u, self.app_planes, self.app_lines), axis=-1
        )
        h = self.basis_mat(feats)
        if direction is not None:
            h = jnp.concatenate([h, direction], axis=-1)
        return nn.sigmoid(self.rgb_mlp(h))

    def __call__(self, x: Array, directions: Optional[Array] = None):
        u, selector = self._normalize(x)
        feats = self._vm_features(u, self.density_planes, self.density_lines)
        sigma_feat = sum(f.sum(-1) for f in feats)
        density = nn.softplus(sigma_feat + 0.1)[..., None] * selector[..., None]
        rgb = self._query_rgb(u, directions)
        return rgb, density


class KPlanesRadianceField(nn.Module):
    """K-Planes: multiplicative spatio(-temporal) plane features + MLP.

    With ``dynamic=True`` three extra space-time planes condition the field
    on a time input (the reference's dynamic benchmark family).
    """

    aabb: Sequence[float]
    resolution: int = 128
    time_resolution: int = 32
    n_features: int = 32
    dynamic: bool = False
    mlp_width: int = 128

    def setup(self):
        R, Rt, C = self.resolution, self.time_resolution, self.n_features
        init = nn.initializers.uniform(scale=0.2)
        self.space_planes = [
            self.param(f"sp{i}", init, (R, R, C)) for i in range(3)
        ]
        if self.dynamic:
            self.time_planes = [
                self.param(f"tp{i}", init, (R, Rt, C)) for i in range(3)
            ]
        self.sigma_head = nn.Dense(1)
        self.rgb_mlp = nn.Sequential(
            [
                nn.Dense(self.mlp_width),
                nn.relu,
                nn.Dense(3),
            ]
        )

    def _features(self, u: Array, t: Optional[Array]) -> Array:
        us = [u[..., 0], u[..., 1], u[..., 2]]
        feat = 1.0
        for i, (a, b) in enumerate(_PLANE_AXES):
            feat = feat * (_interp_plane(self.space_planes[i], us[a], us[b]) + 0.5)
        if self.dynamic:
            assert t is not None, "dynamic K-Planes needs timestamps"
            tt = jnp.clip(t[..., 0], 0.0, 1.0)
            for i in range(3):
                feat = feat * (
                    _interp_plane(self.time_planes[i], us[i], tt) + 0.5
                )
        return feat

    def query_density(self, x: Array, t: Optional[Array] = None):
        aabb = jnp.asarray(self.aabb, jnp.float32)
        u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        feat = self._features(jnp.clip(u, 0, 1), t)
        sigma = trunc_exp(self.sigma_head(feat) - 1.0)
        return sigma * selector[..., None]

    def __call__(
        self,
        x: Array,
        t: Optional[Array] = None,
        directions: Optional[Array] = None,
    ):
        aabb = jnp.asarray(self.aabb, jnp.float32)
        u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        feat = self._features(jnp.clip(u, 0, 1), t)
        sigma = trunc_exp(self.sigma_head(feat) - 1.0) * selector[..., None]
        h = feat
        if directions is not None:
            h = jnp.concatenate([feat, directions], axis=-1)
        rgb = nn.sigmoid(self.rgb_mlp(h))
        return rgb, sigma
