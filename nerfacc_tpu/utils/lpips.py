"""Pure-JAX LPIPS (VGG16 backbone) perceptual metric.

Parity target: the reference evaluates LPIPS-vgg unconditionally in every
NGP eval loop (``examples/train_ngp_nerf_occ.py:146-148,234``).  This module
reproduces the LPIPS computation graph (Zhang et al. 2018) in JAX:

    VGG16 conv trunk -> features at {relu1_2, relu2_2, relu3_3, relu4_3,
    relu5_3} -> per-channel unit normalization -> squared difference ->
    1x1 linear calibration -> spatial mean -> sum over stages.

Weight sourcing (in priority order):

1. ``NERFACC_LPIPS_WEIGHTS`` — path to an ``.npz`` holding torchvision
   VGG16 conv weights (``features.{i}.weight/bias`` in PyTorch OIHW
   layout) and the LPIPS linear calibration weights (``lin{k}``, shape
   ``(C_k,)``).  Generate it on any machine with torchvision + lpips via
   ``scripts/export_lpips_weights.py``, then this module computes the
   *exact* reference LPIPS-vgg number.
2. Offline fallback (the default in this zero-egress environment, where
   no pretrained VGG weights exist on disk): the same architecture with
   **deterministic He-initialized filters from a fixed seed** and uniform
   calibration.  Zhang et al. 2018 (§5, "randomly initialized networks")
   report that untrained VGG features already yield a perceptual metric
   far better than pixel metrics; the fixed seed makes the number
   reproducible across runs/machines.  Scores from the two weight sources
   are NOT interchangeable — eval loops label which was used
   (``lpips(vgg)`` vs ``lpips(rnd)``).

Either way the metric runs unconditionally — no optional installs.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# VGG16 conv plan: (out_channels, n_convs) per stage; LPIPS taps the last
# relu of each stage.  torchvision `features` indices of the conv layers:
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

# ImageNet normalization LPIPS applies after scaling images to [-1, 1].
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv_shapes() -> List[Tuple[int, int]]:
    """(in_ch, out_ch) for the 13 VGG16 convs, in order."""
    shapes = []
    c_in = 3
    for c_out, reps in _VGG_STAGES:
        for _ in range(reps):
            shapes.append((c_in, c_out))
            c_in = c_out
    return shapes


@functools.lru_cache(maxsize=1)
def _load_params() -> Tuple[tuple, tuple, str]:
    """Returns (conv params HWIO, per-stage lin weights, source tag)."""
    path = os.environ.get("NERFACC_LPIPS_WEIGHTS", "")
    shapes = _conv_shapes()
    if path and os.path.exists(path):
        z = np.load(path)
        convs = []
        for j, torch_i in enumerate(_TORCH_CONV_IDX):
            w = z[f"features.{torch_i}.weight"]  # (O, I, H, W)
            b = z[f"features.{torch_i}.bias"]
            assert w.shape[:2][::-1] == shapes[j], (w.shape, shapes[j])
            convs.append(
                (np.transpose(w, (2, 3, 1, 0)).astype(np.float32), b)
            )
        lins = tuple(
            z[f"lin{k}"].reshape(-1).astype(np.float32) for k in range(5)
        )
        return tuple(convs), lins, "vgg"

    # Deterministic offline fallback: He-init filters, fixed seed.
    rng = np.random.RandomState(0x1B515)  # fixed: reproducible everywhere
    convs = []
    for c_in, c_out in shapes:
        std = np.sqrt(2.0 / (9 * c_in))
        w = rng.normal(0.0, std, size=(3, 3, c_in, c_out)).astype(np.float32)
        convs.append((w, np.zeros((c_out,), np.float32)))
    # Uniform calibration normalized like LPIPS's lin layers (mean over
    # channels instead of a learned projection).
    lins = tuple(
        np.full((c,), 1.0 / c, np.float32) for c, _ in _VGG_STAGES
    )
    return tuple(convs), lins, "rnd"


def _vgg_features(x: Array, convs) -> List[Array]:
    """x: (N, H, W, 3) normalized. Returns the 5 tapped feature maps."""
    feats = []
    i = 0
    for stage, (_, reps) in enumerate(_VGG_STAGES):
        for _ in range(reps):
            w, b = convs[i]
            x = jax.lax.conv_general_dilated(
                x,
                jnp.asarray(w),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b)
            x = jax.nn.relu(x)
            i += 1
        feats.append(x)
        if stage < len(_VGG_STAGES) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
    return feats


def _unit_normalize(f: Array) -> Array:
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)


@jax.jit
def _lpips_jit(pred: Array, target: Array) -> Array:
    convs, lins, _ = _load_params()
    # LPIPS input convention: [-1, 1] then shift/scale normalization.
    def prep(img):
        img = img * 2.0 - 1.0
        return (img - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

    fp = _vgg_features(prep(pred), convs)
    ft = _vgg_features(prep(target), convs)
    total = jnp.zeros(pred.shape[:-3], pred.dtype)
    for k, (a, b) in enumerate(zip(fp, ft)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        total = total + jnp.mean(
            jnp.sum(d * jnp.asarray(lins[k]), axis=-1), axis=(-2, -1)
        )
    return total


def lpips(pred: Array, target: Array) -> Tuple[float, str]:
    """LPIPS distance between images in [0, 1], shape (H, W, 3) or
    (N, H, W, 3).  Returns ``(value, source)`` where source is ``"vgg"``
    (exact reference LPIPS, weights npz provided) or ``"rnd"`` (the
    documented offline fallback — see module docstring).
    """
    _, _, src = _load_params()
    p = jnp.asarray(pred, jnp.float32)
    t = jnp.asarray(target, jnp.float32)
    if p.ndim == 3:
        p, t = p[None], t[None]
        return float(_lpips_jit(p, t)[0]), src
    return float(jnp.mean(_lpips_jit(p, t))), src
