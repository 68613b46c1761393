"""Vanilla-NeRF MLP radiance-field family (flax.linen).

Parity target: ``examples/radiance_fields/mlp.py`` — ``MLP`` with skip
connections, ``NerfMLP`` sigma+rgb heads with view-condition bottleneck,
``SinusoidalEncoder`` positional encoding, ``VanillaNeRFRadianceField``,
``TNeRFRadianceField`` (time-warped dynamic variant).

TPU notes: all layers are plain ``nn.Dense`` — XLA maps the batched matmuls
straight onto the MXU.  Keep sample batches large (the render drivers compact
valid samples densely before calling the field).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class MLP(nn.Module):
    """MLP with periodic skip connections (``mlp.py:14-101``)."""

    output_dim: Optional[int] = None
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    hidden_activation: Callable = nn.relu
    output_enabled: bool = True
    output_init_scale: Optional[float] = None  # uniform(0, b) when set

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inputs = x
        for i in range(self.net_depth):
            x = nn.Dense(
                self.net_width, kernel_init=nn.initializers.xavier_uniform()
            )(x)
            x = self.hidden_activation(x)
            if (
                self.skip_layer is not None
                and i % self.skip_layer == 0
                and i > 0
            ):
                x = jnp.concatenate([x, inputs], axis=-1)
        if self.output_enabled:
            if self.output_init_scale is not None:
                kinit = nn.initializers.uniform(scale=self.output_init_scale)
            else:
                kinit = nn.initializers.xavier_uniform()
            x = nn.Dense(self.output_dim, kernel_init=kinit)(x)
        return x


class NerfMLP(nn.Module):
    """Trunk + sigma head + view-conditioned rgb head (``mlp.py:114-165``)."""

    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128

    def setup(self):
        self.base = MLP(
            net_depth=self.net_depth,
            net_width=self.net_width,
            skip_layer=self.skip_layer,
            output_enabled=False,
        )
        self.sigma_layer = MLP(
            output_dim=1, net_depth=0, skip_layer=None
        )
        self.bottleneck_layer = MLP(
            output_dim=self.net_width, net_depth=0, skip_layer=None
        )
        self.rgb_layer = MLP(
            output_dim=3,
            net_depth=self.net_depth_condition,
            net_width=self.net_width_condition,
            skip_layer=None,
        )

    def query_density(self, x: Array) -> Array:
        return self.sigma_layer(self.base(x))

    def __call__(self, x: Array, condition: Optional[Array] = None):
        x = self.base(x)
        raw_sigma = self.sigma_layer(x)
        if condition is not None:
            if condition.shape[:-1] != x.shape[:-1]:
                # Broadcast per-ray condition across samples.
                condition = jnp.broadcast_to(
                    condition.reshape(
                        condition.shape[:1]
                        + (1,) * (x.ndim - condition.ndim)
                        + condition.shape[-1:]
                    ),
                    x.shape[:-1] + condition.shape[-1:],
                )
            bottleneck = self.bottleneck_layer(x)
            x = jnp.concatenate([bottleneck, condition], axis=-1)
        raw_rgb = self.rgb_layer(x)
        return raw_rgb, raw_sigma


class SinusoidalEncoder(nn.Module):
    """NeRF positional encoding (``mlp.py:168-203``)."""

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
    def __call__(self, x: Array) -> Array:
        if self.max_deg == self.min_deg:
            return x
        scales = jnp.asarray(
            [2**i for i in range(self.min_deg, self.max_deg)], x.dtype
        )
        xb = (x[..., None, :] * scales[:, None]).reshape(
            x.shape[:-1] + ((self.max_deg - self.min_deg) * self.x_dim,)
        )
        latent = jnp.sin(
            jnp.concatenate([xb, xb + 0.5 * math.pi], axis=-1)
        )
        if self.use_identity:
            latent = jnp.concatenate([x, latent], axis=-1)
        return latent


class VanillaNeRFRadianceField(nn.Module):
    """PE(10/4-deg) + NerfMLP (``mlp.py:206-245``).

    Methods are selected via ``method=`` when applying:
    ``model.apply(params, x, cond, method='forward')`` etc.
    """

    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128

    def setup(self):
        self.posi_encoder = SinusoidalEncoder(3, 0, 10, True)
        self.view_encoder = SinusoidalEncoder(3, 0, 4, True)
        self.mlp = NerfMLP(
            net_depth=self.net_depth,
            net_width=self.net_width,
            skip_layer=self.skip_layer,
            net_depth_condition=self.net_depth_condition,
            net_width_condition=self.net_width_condition,
        )

    def query_opacity(self, x: Array, step_size: float) -> Array:
        # density * step_size approximates 1 - exp(-density*step) for small
        # densities (the reference's own approximation, mlp.py:228-233).
        return self.query_density(x) * step_size

    def query_density(self, x: Array) -> Array:
        sigma = self.mlp.query_density(self.posi_encoder(x))
        return nn.relu(sigma)

    def __call__(self, x: Array, condition: Optional[Array] = None):
        x = self.posi_encoder(x)
        if condition is not None:
            condition = self.view_encoder(condition)
        rgb, sigma = self.mlp(x, condition=condition)
        return nn.sigmoid(rgb), nn.relu(sigma)


class TNeRFRadianceField(nn.Module):
    """Time-warped dynamic NeRF (``mlp.py:248-283``)."""

    def setup(self):
        self.posi_encoder = SinusoidalEncoder(3, 0, 4, True)
        self.time_encoder = SinusoidalEncoder(1, 0, 4, True)
        self.warp = MLP(
            output_dim=3,
            net_depth=4,
            net_width=64,
            skip_layer=2,
            output_init_scale=1e-4,
        )
        self.nerf = VanillaNeRFRadianceField()

    def _warped(self, x: Array, t: Array) -> Array:
        return x + self.warp(
            jnp.concatenate(
                [self.posi_encoder(x), self.time_encoder(t)], axis=-1
            )
        )

    def query_opacity(self, x: Array, t: Array, step_size: float) -> Array:
        return self.query_density(x, t) * step_size

    def query_density(self, x: Array, t: Array) -> Array:
        return self.nerf.query_density(self._warped(x, t))

    def __call__(self, x: Array, t: Array, condition: Optional[Array] = None):
        return self.nerf(self._warped(x, t), condition=condition)


class NDRTNeRFRadianceField(nn.Module):
    """Invertible-warp dynamic NeRF (``mlp.py:286-395``; NDR,
    arXiv:2206.15258).  Three coupled invertible blocks, each translating/
    rotating a 2-D slice conditioned on the third coordinate and time."""

    def setup(self):
        self.time_encoder = SinusoidalEncoder(1, 0, 4, True)
        self.posi_encoder_1 = SinusoidalEncoder(2, 0, 4, True)
        self.posi_encoder_2 = SinusoidalEncoder(1, 0, 4, True)
        self.warp_layers_1 = [
            MLP(
                output_dim=1,
                net_depth=2,
                net_width=128,
                skip_layer=None,
                output_init_scale=1e-4,
            )
            for _ in range(3)
        ]
        self.warp_layers_2 = [
            MLP(
                output_dim=1 + 2,
                net_depth=1,
                net_width=128,
                skip_layer=None,
                output_init_scale=1e-4,
            )
            for _ in range(3)
        ]
        self.time_layers_1 = [
            MLP(output_dim=64, net_depth=0, skip_layer=None) for _ in range(3)
        ]
        self.time_layers_2 = [
            MLP(output_dim=64, net_depth=0, skip_layer=None) for _ in range(3)
        ]
        self.nerf = VanillaNeRFRadianceField()

    def _warp_block(self, x: Array, t_enc: Array, i: int) -> Array:
        uv, w = x[..., :2], x[..., 2:]
        dw = self.warp_layers_1[i](
            jnp.concatenate(
                [self.posi_encoder_1(uv), self.time_layers_1[i](t_enc)], -1
            )
        )
        w = w + dw
        rt = self.warp_layers_2[i](
            jnp.concatenate(
                [self.posi_encoder_2(w), self.time_layers_2[i](t_enc)], -1
            )
        )
        theta = rt[..., 0]
        tr = rt[..., 1:]
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        u = uv[..., 0] - tr[..., 0]
        v = uv[..., 1] - tr[..., 1]
        # inverse 2-D rotation applied to the translated uv
        uv = jnp.stack([cos * u - sin * v, sin * u + cos * v], -1)
        return jnp.concatenate([uv, w], -1)

    def warp(self, x: Array, t: Array) -> Array:
        t_enc = self.time_encoder(t)
        x = self._warp_block(x, t_enc, 0)
        x = x[..., jnp.array([1, 2, 0])]
        x = self._warp_block(x, t_enc, 1)
        x = x[..., jnp.array([2, 0, 1])]
        x = self._warp_block(x, t_enc, 2)
        return x

    def query_opacity(self, x: Array, t: Array, step_size: float) -> Array:
        return self.query_density(x, t) * step_size

    def query_density(self, x: Array, t: Array) -> Array:
        return self.nerf.query_density(self.warp(x, t))

    def __call__(self, x: Array, t: Array, condition: Optional[Array] = None):
        return self.nerf(self.warp(x, t), condition=condition)
