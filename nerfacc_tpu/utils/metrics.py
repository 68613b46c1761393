"""Image-quality metrics for the eval loops: PSNR, SSIM, MS-SSIM.

Parity note: the reference evaluates PSNR + LPIPS-vgg
(``examples/train_ngp_nerf_occ.py:146-148,220-262``).  LPIPS requires
pretrained VGG weights, which cannot be fetched in this zero-egress
environment and do not ship with the repo; MS-SSIM is the documented
substitute perceptual metric (same monotonic intent: structural similarity
across scales), with the LPIPS hook left in place — ``lpips_or_none``
returns a value whenever a ``torchvision``/``lpips`` install with weights is
available at runtime.

All metrics are pure JAX, jittable, and batched over leading dims; images
are float arrays in [0, 1] shaped ``(..., H, W, C)``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def psnr(pred: Array, target: Array, max_val: float = 1.0) -> Array:
    mse = jnp.mean((pred - target) ** 2, axis=(-3, -2, -1))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10) / (max_val**2))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(img: Array, kernel: np.ndarray) -> Array:
    """Separable depthwise 2-D filter over (..., H, W, C), valid padding."""
    k = jnp.asarray(kernel)
    batch_shape = img.shape[:-3]
    h, w, c = img.shape[-3:]
    x = img.reshape((-1, h, w, c))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (k.size, 1, 1, c), ("NHWC", "HWIO", "NHWC")
    )
    rhs_h = jnp.broadcast_to(k[:, None, None, None], (k.size, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, rhs_h, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c,
    )
    rhs_w = jnp.broadcast_to(k[None, :, None, None], (1, k.size, 1, c))
    x = jax.lax.conv_general_dilated(
        x, rhs_w, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c,
    )
    return x.reshape(batch_shape + x.shape[1:])


@functools.partial(jax.jit, static_argnames=("win_size", "return_cs"))
def ssim(
    pred: Array,
    target: Array,
    max_val: float = 1.0,
    win_size: int = 11,
    return_cs: bool = False,
):
    """SSIM (Wang et al. 2004) with the standard 11x11 Gaussian window.

    Channel dim last; returns the mean SSIM over pixels/channels (and the
    contrast-structure term when ``return_cs``, for MS-SSIM).
    """
    kernel = _gaussian_kernel(win_size)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_p = _filter2d(pred, kernel)
    mu_t = _filter2d(target, kernel)
    mu_pp = _filter2d(pred * pred, kernel)
    mu_tt = _filter2d(target * target, kernel)
    mu_pt = _filter2d(pred * target, kernel)
    var_p = mu_pp - mu_p**2
    var_t = mu_tt - mu_t**2
    cov = mu_pt - mu_p * mu_t
    cs = (2 * cov + c2) / (var_p + var_t + c2)
    s = ((2 * mu_p * mu_t + c1) / (mu_p**2 + mu_t**2 + c1)) * cs
    mean_axes = (-3, -2, -1)
    if return_cs:
        return jnp.mean(s, mean_axes), jnp.mean(cs, mean_axes)
    return jnp.mean(s, mean_axes)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _downsample2x(img: Array) -> Array:
    h, w = img.shape[-3] // 2 * 2, img.shape[-2] // 2 * 2
    img = img[..., :h, :w, :]
    return 0.25 * (
        img[..., 0::2, 0::2, :]
        + img[..., 1::2, 0::2, :]
        + img[..., 0::2, 1::2, :]
        + img[..., 1::2, 1::2, :]
    )


def ms_ssim(
    pred: Array, target: Array, max_val: float = 1.0, win_size: int = 11
) -> Array:
    """Multi-scale SSIM (Wang et al. 2003), 5 scales, standard weights.

    The documented stand-in for LPIPS in this repo's eval loops (see module
    docstring).  Images must be at least ``win_size * 2^4`` on each side for
    the full 5 scales; smaller images use as many scales as fit.
    """
    levels = 0
    h, w = pred.shape[-3], pred.shape[-2]
    while levels < 5 and min(h, w) >= win_size:
        levels += 1
        h, w = h // 2, w // 2
    weights = np.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / weights.sum()
    vals = []
    for lvl in range(levels):
        if lvl == levels - 1:
            s = ssim(pred, target, max_val, win_size)
            vals.append(jnp.maximum(s, 0.0))
        else:
            _, cs = ssim(pred, target, max_val, win_size, return_cs=True)
            vals.append(jnp.maximum(cs, 0.0))
            pred = _downsample2x(pred)
            target = _downsample2x(target)
    out = jnp.ones_like(vals[0])
    for v, wgt in zip(vals, weights):
        out = out * v**wgt
    return out


def lpips_or_none(pred: np.ndarray, target: np.ndarray) -> Optional[float]:
    """LPIPS-vgg if a weights-bearing install exists; None otherwise.

    Mirrors the reference's metric exactly when available
    (``train_ngp_nerf_occ.py:146-148``); callers should fall back to
    :func:`ms_ssim` when this returns None.
    """
    try:
        import torch
        import lpips as _lpips  # type: ignore

        net = _lpips.LPIPS(net="vgg")
        a = torch.from_numpy(
            np.moveaxis(pred.astype(np.float32), -1, 0)[None] * 2 - 1
        )
        b = torch.from_numpy(
            np.moveaxis(target.astype(np.float32), -1, 0)[None] * 2 - 1
        )
        with torch.no_grad():
            return float(net(a, b).item())
    except Exception:
        return None
