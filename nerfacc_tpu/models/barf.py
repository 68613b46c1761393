"""BARF-style bundle-adjusting radiance field: learnable SE(3) camera-pose
deltas + coarse-to-fine annealed positional encoding.

Parity target: the reference's BARF benchmark plug-in (``.gitmodules:10-13``,
results table ``docs/source/examples/camera/barf.rst:12-34``) — a vanilla
NeRF whose camera poses are imperfect and jointly optimized with the field,
accelerated by the occupancy-grid estimator.  TPU redesign notes:

- Ray generation happens *inside* the jitted train step as a batched pose
  compose + matmul (differentiable w.r.t. the per-camera 6-DoF deltas);
  there is no per-camera Python loop and no ragged work — the sampled pixel
  batch gathers its cameras' delta rows in one indexed read.
- The SE(3) exponential and the annealing window are pure VPU arithmetic on
  static shapes; the annealing progress ``alpha`` is traced as a scalar
  argument so one compiled step serves the whole schedule.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .mlp import NerfMLP

Array = jnp.ndarray


def _hat(w: Array) -> Array:
    """Skew-symmetric matrix of (..., 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def se3_exp(xi: Array) -> Array:
    """SE(3) exponential map: ``(..., 6)`` twist ``[omega | v]`` to a
    ``(..., 3, 4)`` rigid transform, Taylor-safe at the identity."""
    w, v = xi[..., :3], xi[..., 3:]
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)
    small = t2 < 1e-8
    # Clamp the denominators BEFORE the where so the untaken branch stays
    # finite under autodiff (inf * 0 = NaN in the VJP otherwise).
    t2s = jnp.maximum(t2, 1e-12)
    t = jnp.sqrt(t2s)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (1.0 - A) / t2s)
    W = _hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A * W + B * W2
    V = eye + B * W + C * W2
    trans = (V @ v[..., None])[..., 0]
    return jnp.concatenate([R, trans[..., None]], axis=-1)


def compose_pose(delta: Array, c2w: Array) -> Array:
    """Left-compose a ``(..., 3, 4)`` delta onto nominal ``(..., 3, 4)``
    camera-to-world poses: ``T_new = exp(xi) @ T_nominal``."""
    R = delta[..., :3] @ c2w[..., :3]
    t = (delta[..., :3] @ c2w[..., 3:4])[..., 0] + delta[..., 3]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def rays_from_pixels(
    x: Array,  # (...,) pixel cols
    y: Array,  # (...,) pixel rows
    K: Array,  # (3, 3)
    c2w: Array,  # (..., 3, 4) per-pixel camera-to-world
    opengl: bool = True,
) -> Tuple[Array, Array]:
    """Differentiable pixel-center ray generation (jnp twin of
    :func:`nerfacc_tpu.datasets.utils.generate_rays`)."""
    sign = -1.0 if opengl else 1.0
    dirs = jnp.stack(
        [
            (x + 0.5 - K[0, 2]) / K[0, 0],
            (y + 0.5 - K[1, 2]) / K[1, 1] * sign,
            sign * jnp.ones_like(x),
        ],
        axis=-1,
    )
    d = (dirs[..., None, :] * c2w[..., :3, :3]).sum(-1)
    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(c2w[..., :3, 3], viewdirs.shape)
    return origins, viewdirs


class PoseRefine(nn.Module):
    """Per-camera learnable SE(3) twist deltas (BARF's pose parameters)."""

    n_cams: int

    @nn.compact
    def __call__(self, cam_ids: Array, c2w_nominal: Array) -> Array:
        """Refined ``(N, 3, 4)`` poses for ``cam_ids`` given nominal poses
        (already gathered to the same leading shape)."""
        xi = self.param(
            "pose_deltas",
            nn.initializers.zeros,
            (self.n_cams, 6),
            jnp.float32,
        )
        return compose_pose(se3_exp(xi[cam_ids]), c2w_nominal)


class AnnealedSinusoidalEncoder(nn.Module):
    """BARF's coarse-to-fine positional encoding (paper eq. 14): frequency
    ``k`` is weighted by ``(1 - cos(pi * clip(alpha*L - k, 0, 1))) / 2`` so
    high frequencies fade in as training progresses (``alpha`` in [0, 1])."""

    x_dim: int
    min_deg: int
    max_deg: int
    use_identity: bool = True

    @property
    def latent_dim(self) -> int:
        return (
            int(self.use_identity) + (self.max_deg - self.min_deg) * 2
        ) * self.x_dim

    @nn.compact
    def __call__(self, x: Array, alpha: Array) -> Array:
        if self.max_deg == self.min_deg:
            return x
        L = self.max_deg - self.min_deg
        scales = jnp.asarray(
            [2**i for i in range(self.min_deg, self.max_deg)], x.dtype
        )
        xb = (x[..., None, :] * scales[:, None]).reshape(
            x.shape[:-1] + (L * self.x_dim,)
        )
        latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * math.pi], axis=-1))
        k = jnp.arange(L, dtype=x.dtype)
        win = 0.5 * (
            1.0 - jnp.cos(jnp.pi * jnp.clip(alpha * L - k, 0.0, 1.0))
        )
        win = jnp.repeat(win[:, None], self.x_dim, axis=-1).reshape(-1)
        latent = latent * jnp.concatenate([win, win], axis=-1)
        if self.use_identity:
            latent = jnp.concatenate([x, latent], axis=-1)
        return latent


class BARFRadianceField(nn.Module):
    """Vanilla-NeRF field with annealed encoders; structure matches
    :class:`~nerfacc_tpu.models.mlp.VanillaNeRFRadianceField` so the
    occ-grid pipeline drives it unchanged (``alpha`` rides in via closure).
    """

    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    pos_deg: int = 10
    view_deg: int = 4

    def setup(self):
        self.posi_encoder = AnnealedSinusoidalEncoder(3, 0, self.pos_deg)
        self.view_encoder = AnnealedSinusoidalEncoder(3, 0, self.view_deg)
        self.mlp = NerfMLP(
            net_depth=self.net_depth,
            net_width=self.net_width,
            skip_layer=self.skip_layer,
            net_depth_condition=self.net_depth_condition,
            net_width_condition=self.net_width_condition,
        )

    def query_opacity(self, x: Array, step_size: float, alpha=1.0) -> Array:
        return self.query_density(x, alpha) * step_size

    def query_density(self, x: Array, alpha=1.0) -> Array:
        alpha = jnp.asarray(alpha, x.dtype)
        sigma = self.mlp.query_density(self.posi_encoder(x, alpha))
        return nn.relu(sigma)

    def __call__(
        self, x: Array, condition: Optional[Array] = None, alpha=1.0
    ):
        alpha = jnp.asarray(alpha, x.dtype)
        x = self.posi_encoder(x, alpha)
        if condition is not None:
            condition = self.view_encoder(condition, alpha)
        rgb, sigma = self.mlp(x, condition=condition)
        return nn.sigmoid(rgb), nn.relu(sigma)
