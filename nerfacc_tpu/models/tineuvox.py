"""TiNeuVox-style time-aware neural voxel radiance field (dynamic scenes).

Workload parity: the reference drives TiNeuVox as a benchmark plug-in
(``/root/reference/.gitmodules:6-15``, BASELINE.md TiNeuVox table: occupancy
skipping cuts D-NeRF training 833 s -> 346 s at +1.4 dB).  The submodule is
code-external, so this is a native re-implementation of the architecture
(Fang et al. 2022) shaped for TPU:

- a *dense* feature voxel grid stored flat ``(R^3, C)`` row-major — corner
  fetches are wide row gathers (the measured-fast layout on v5e; see
  ``hash_soa.py``), and the autodiff backward is a row scatter-add;
- multi-distance interpolation queries the same grid at strides (1, 2, 4)
  — three trilinear taps of growing radius, concatenated;
- a deformation MLP conditioned on a learned time embedding warps sample
  positions to canonical space before the voxel lookup;
- density/color heads follow the Instant-NGP split (density + geo feature,
  view-conditioned color), all 64-wide Dense stacks that XLA fuses onto the
  MXU.

Interface matches :class:`~nerfacc_tpu.models.mlp.TNeRFRadianceField`
(``query_density(x, t)`` / ``__call__(x, t, dirs)``) so it drops into the
T-NeRF/D-NeRF training pipeline and the OccGrid estimator unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoding import spherical_harmonics_deg4
from .mlp import SinusoidalEncoder
from .ngp import trunc_exp

Array = jnp.ndarray


class TimeAwareVoxelGrid(nn.Module):
    """Dense feature voxels with multi-distance trilinear interpolation.

    ``x`` in [0, 1]^3; returns ``(..., len(strides) * features)``.  Stride
    ``s`` interpolates over the sub-lattice of every s'th grid point — the
    coarser taps see a wider neighborhood (TiNeuVox's "multi-distance
    interpolation") at zero extra parameter cost.
    """

    resolution: int = 96
    features: int = 8
    strides: Tuple[int, ...] = (1, 2, 4)

    @property
    def latent_dim(self) -> int:
        return len(self.strides) * self.features

    @nn.compact
    def __call__(self, x: Array) -> Array:
        R, C = self.resolution, self.features
        grid = self.param(
            "grid", nn.initializers.normal(stddev=1e-2), (R * R * R, C)
        )
        batch_shape = x.shape[:-1]
        n = int(np.prod(batch_shape)) if batch_shape else 1
        xs = x[..., 0].reshape(n)
        ys = x[..., 1].reshape(n)
        zs = x[..., 2].reshape(n)

        outs = []
        for s in self.strides:
            # Sub-lattice of every s'th grid row.  Grid row j sits at world
            # coordinate j/(R-1) (align-corners, shared by every stride), so
            # sub-lattice cell coords scale by (R-1)/s — row k*s then
            # represents the SAME world position at every stride.  The last
            # partial cell (when s does not divide R-1) clamps to the final
            # full sub-cell.
            ks = (R - 1) // s  # last sub-lattice index with k*s <= R-1

            def prep(c):
                cf = jnp.clip(c, 0.0, 1.0) * (R - 1) / s
                c0 = jnp.clip(jnp.floor(cf), 0, ks - 1).astype(jnp.int32)
                return c0, jnp.clip(cf - c0, 0.0, 1.0)

            cx, wx = prep(xs)
            cy, wy = prep(ys)
            cz, wz = prep(zs)
            acc = jnp.zeros((n, C), x.dtype)
            for dx in (0, 1):
                wxa = wx if dx else 1.0 - wx
                ix = (cx + dx) * s
                for dy in (0, 1):
                    wya = wy if dy else 1.0 - wy
                    iy = (cy + dy) * s
                    wxy = wxa * wya
                    for dz in (0, 1):
                        wza = wz if dz else 1.0 - wz
                        iz = (cz + dz) * s
                        idx = (ix * R + iy) * R + iz
                        rows = jnp.take(grid, idx, axis=0)  # (n, C)
                        acc = acc + rows * (wxy * wza)[:, None]
            outs.append(acc)
        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(batch_shape + (self.latent_dim,))


class TiNeuVoxRadianceField(nn.Module):
    """Deformation + time-aware voxels + shallow heads (TiNeuVox)."""

    aabb: Sequence[float] = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)
    resolution: int = 96
    features: int = 8
    strides: Tuple[int, ...] = (1, 2, 4)
    time_embed_dim: int = 8
    net_width: int = 64
    geo_feat_dim: int = 15
    use_viewdirs: bool = True

    def setup(self):
        self.posi_encoder = SinusoidalEncoder(
            x_dim=3, min_deg=0, max_deg=8, use_identity=True
        )
        self.time_encoder = SinusoidalEncoder(
            x_dim=1, min_deg=0, max_deg=6, use_identity=True
        )
        self.time_net = nn.Sequential(
            [nn.Dense(self.net_width), nn.relu, nn.Dense(self.time_embed_dim)]
        )
        self.deform_net = nn.Sequential(
            [
                nn.Dense(self.net_width),
                nn.relu,
                nn.Dense(self.net_width),
                nn.relu,
                nn.Dense(3, kernel_init=nn.initializers.normal(stddev=1e-4)),
            ]
        )
        self.voxels = TimeAwareVoxelGrid(
            resolution=self.resolution,
            features=self.features,
            strides=self.strides,
        )
        self.mlp_base = nn.Sequential(
            [
                nn.Dense(self.net_width),
                nn.relu,
                nn.Dense(1 + self.geo_feat_dim),
            ]
        )
        self.mlp_head = nn.Sequential(
            [
                nn.Dense(self.net_width),
                nn.relu,
                nn.Dense(self.net_width),
                nn.relu,
                nn.Dense(3),
            ]
        )

    def _canonical(self, x: Array, t: Array) -> Tuple[Array, Array, Array]:
        """Warp to canonical space; returns (x_unit, selector, t_embed)."""
        aabb = jnp.asarray(self.aabb, jnp.float32)
        t_embed = self.time_net(self.time_encoder(t))
        dx = self.deform_net(
            jnp.concatenate([self.posi_encoder(x), t_embed], axis=-1)
        )
        x_c = x + dx
        u = (x_c - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
        return u, selector, t_embed

    def query_density(self, x: Array, t: Array, return_feat: bool = False):
        u, selector, t_embed = self._canonical(x, t)
        feats = self.voxels(u)
        h = jnp.concatenate(
            [feats, self.posi_encoder(u), t_embed], axis=-1
        )
        h = self.mlp_base(h)
        density_before, geo = h[..., :1], h[..., 1:]
        density = trunc_exp(density_before - 1) * selector[..., None]
        if return_feat:
            return density, geo
        return density

    def query_opacity(self, x: Array, t: Array, step_size: float) -> Array:
        return self.query_density(x, t) * step_size

    def __call__(
        self, x: Array, t: Array, condition: Optional[Array] = None
    ):
        density, geo = self.query_density(x, t, return_feat=True)
        if self.use_viewdirs and condition is not None:
            h = jnp.concatenate(
                [spherical_harmonics_deg4(condition), geo], axis=-1
            )
        else:
            h = geo
        rgb = nn.sigmoid(self.mlp_head(h))
        return rgb, density
