"""Shared training/eval helpers for the example CLIs.

Parity target: the glue in ``examples/train_*.py`` and ``examples/utils.py``
(metrics, eval loops, per-dataset config blocks).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

# Allow running as `python examples/train_x.py` from the repo root.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

NERF_SYNTHETIC_SCENES = [
    "chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship",
]
MIPNERF360_UNBOUNDED_SCENES = [
    "garden", "bicycle", "bonsai", "counter", "kitchen", "room", "stump",
]


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> float:
    mse = float(jnp.mean((pred - target) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def eval_metrics(pred: jnp.ndarray, target: jnp.ndarray) -> dict:
    """PSNR + SSIM + MS-SSIM + LPIPS (unconditional — exact LPIPS-vgg when
    a weights npz is provided, the documented fixed-seed fallback
    otherwise; see nerfacc_tpu/utils/lpips.py)."""
    from nerfacc_tpu.utils.lpips import lpips
    from nerfacc_tpu.utils.metrics import ms_ssim, ssim

    lp, lp_src = lpips(pred, target)
    return {
        "psnr": psnr(pred, target),
        "ssim": float(ssim(pred, target)),
        "ms_ssim": float(ms_ssim(pred, target)),
        "lpips": lp,
        "lpips_src": lp_src,
    }


def render_image_chunked(render_fn, rays, chunk: int = 8192):
    """Eval-time full-image render: pad the flattened rays to a multiple of
    ``chunk`` so one jitted chunk shape serves every image."""
    h, w = rays.origins.shape[:2]
    o = rays.origins.reshape(-1, 3)
    d = rays.viewdirs.reshape(-1, 3)
    n = o.shape[0]
    n_pad = (-n) % chunk
    o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (n_pad, 3))])
    d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (n_pad, 3))])
    outs = []
    for i in range(0, n + n_pad, chunk):
        colors = render_fn(o[i : i + chunk], d[i : i + chunk])
        outs.append(colors)
    img = jnp.concatenate(outs, axis=0)[:n]
    return img.reshape(h, w, 3)


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0
