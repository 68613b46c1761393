"""OpenCV lens undistortion (Newton iteration), pure jnp.

Parity target: ``nerfacc/cameras.py`` + ``nerfacc/cuda/csrc/camera.cu``.
The CUDA kernels are per-point Newton loops; here the fixed iteration count
unrolls into vectorized VPU element-wise math (``lax.fori_loop``-free because
``iters`` is tiny and static).  Also provides the forward distortion models
used as test oracles (``cameras.py:74-120``).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

__all__ = [
    "opencv_lens_undistortion",
    "opencv_lens_undistortion_fisheye",
]


def _pad_params(params: Array, n: int = 8) -> Array:
    if params.shape[-1] < n:
        pad = [(0, 0)] * (params.ndim - 1) + [(0, n - params.shape[-1])]
        params = jnp.pad(params, pad)
    return params


def _residual_and_jacobian(x, y, xd, yd, params):
    """Residual of the 8-param distortion model and its Jacobian
    (``cameras.py:123-180``)."""
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(params, -1, 0)

    r = x * x + y * y
    alpha = 1.0 + r * (k1 + r * (k2 + r * k3))
    beta = 1.0 + r * (k4 + r * (k5 + r * k6))
    d = alpha / beta

    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd

    alpha_r = k1 + r * (2.0 * k2 + r * (3.0 * k3))
    beta_r = k4 + r * (2.0 * k5 + r * (3.0 * k6))
    d_r = (alpha_r * beta - alpha * beta_r) / (beta * beta)
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r

    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def opencv_lens_undistortion(
    uv: Array, params: Array, eps: float = 1e-6, iters: int = 10
) -> Array:
    """Undistort OpenCV {k1,k2,p1,p2,k3,k4,k5,k6} distortion by 2-D Newton.

    Parity: ``nerfacc/cameras.py:13-46`` / ``camera.cu:37-107``.  ``params``
    has trailing dim in {0, 1, 2, 4, 8} and broadcasts against ``uv``.
    """
    assert uv.shape[-1] == 2
    assert params.shape[-1] in (0, 1, 2, 4, 8)
    if params.shape[-1] == 0:
        return uv
    params = _pad_params(params, 8)
    params = jnp.broadcast_to(params, uv.shape[:-1] + (8,))

    x0 = uv[..., 0]
    y0 = uv[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        fx, fy, fx_x, fx_y, fy_x, fy_y = _residual_and_jacobian(
            x, y, x0, y0, params
        )
        denom = fy_x * fx_y - fx_x * fy_y
        mask = jnp.abs(denom) > eps
        safe = jnp.where(mask, denom, 1.0)
        x = x + jnp.where(mask, (fx * fy_y - fy * fx_y) / safe, 0.0)
        y = y + jnp.where(mask, (fy * fx_x - fx * fy_x) / safe, 0.0)
    return jnp.stack([x, y], axis=-1)


def opencv_lens_undistortion_fisheye(
    uv: Array, params: Array, eps: float = 1e-6, iters: int = 10
) -> Array:
    """Undistort the OpenCV fisheye {k1,k2,k3,k4} model by scalar Newton on
    theta.  Parity: ``cameras.py:49-71`` / ``utils_camera.cuh:138-196``.
    """
    assert uv.shape[-1] == 2
    assert params.shape[-1] == 4
    params = jnp.broadcast_to(params, uv.shape[:-1] + (4,))
    k1, k2, k3, k4 = jnp.moveaxis(params, -1, 0)

    u, v = uv[..., 0], uv[..., 1]
    theta_d = jnp.sqrt(u * u + v * v)
    theta_d = jnp.clip(theta_d, -jnp.pi / 2, jnp.pi / 2)

    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        t4 = t2 * t2
        t6 = t4 * t2
        t8 = t6 * t2
        num = theta * (1 + k1 * t2 + k2 * t4 + k3 * t6 + k4 * t8) - theta_d
        den = 1 + 3 * k1 * t2 + 5 * k2 * t4 + 7 * k3 * t6 + 9 * k4 * t8
        theta = theta - num / den

    scale = jnp.where(
        jnp.abs(theta_d) > eps,
        jnp.tan(theta) / jnp.where(jnp.abs(theta_d) > eps, theta_d, 1.0),
        1.0,
    )
    return uv * scale[..., None]


# ---------------------------------------------------------------------------
# Forward distortion models (test oracles; cameras.py:74-120)
# ---------------------------------------------------------------------------


def _opencv_lens_distortion(uv: Array, params: Array) -> Array:
    """Forward OpenCV distortion {k1,k2,p1,p2,k3,k4,k5,k6}."""
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(params, -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r2 = u * u + v * v
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6)
    fx = 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
    fy = 2 * p2 * u * v + p1 * (r2 + 2 * v * v)
    return jnp.stack([u * radial + fx, v * radial + fy], axis=-1)


def _opencv_lens_distortion_fisheye(
    uv: Array, params: Array, eps: float = 1e-10
) -> Array:
    """Forward OpenCV fisheye distortion {k1,k2,k3,k4}."""
    k1, k2, k3, k4 = jnp.moveaxis(params, -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r = jnp.sqrt(u * u + v * v)
    theta = jnp.arctan(r)
    theta_d = theta * (
        1 + k1 * theta**2 + k2 * theta**4 + k3 * theta**6 + k4 * theta**8
    )
    scale = theta_d / jnp.clip(r, min=eps)
    return uv * scale[..., None]
