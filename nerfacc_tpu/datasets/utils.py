"""Dataset utilities: ray containers and camera ray generation.

Parity target: ``examples/datasets/utils.py`` (``Rays`` namedtuple) plus the
on-device ray generation logic shared by the reference loaders
(``examples/datasets/nerf_synthetic.py:164-227``, OpenGL convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class Rays(NamedTuple):
    origins: Array  # (..., 3)
    viewdirs: Array  # (..., 3)


def namedtuple_map(fn, tup):
    return type(tup)(*(None if x is None else fn(x) for x in tup))


def generate_rays(
    x: np.ndarray,  # pixel cols (...,)
    y: np.ndarray,  # pixel rows (...,)
    K: np.ndarray,  # (3, 3) intrinsics
    c2w: np.ndarray,  # (..., 3, 4) or (3, 4) camera-to-world
    opengl: bool = True,
) -> Rays:
    """Pixel-center rays; OpenGL (-z forward) or OpenCV (+z) convention."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    sign = -1.0 if opengl else 1.0
    dirs = np.stack(
        [
            (x + 0.5 - cx) / fx,
            (y + 0.5 - cy) / fy * sign,
            sign * np.ones_like(x),
        ],
        axis=-1,
    )  # (..., 3) camera space
    rot = c2w[..., :3, :3]
    trans = c2w[..., :3, 3]
    d = (dirs[..., None, :] * rot).sum(-1)
    viewdirs = d / np.linalg.norm(d, axis=-1, keepdims=True)
    origins = np.broadcast_to(trans, viewdirs.shape)
    return Rays(
        origins=jnp.asarray(origins.astype(np.float32)),
        viewdirs=jnp.asarray(viewdirs.astype(np.float32)),
    )
