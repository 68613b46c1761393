"""NeRF-Synthetic (blender) dataset loader.

Parity target: ``examples/datasets/nerf_synthetic.py`` — transforms_*.json +
PNG loader, random-pixel ray batches for training / full-image rays for eval,
RGBA composited over a background color.

TPU notes: data prep is host-side numpy; each fetched batch is a pytree of
jnp arrays with *static* shapes (fixed ``num_rays``), so the jitted train
step never retraces.  RNG is numpy (host input pipeline), matching the
per-host input pipeline design for multi-host training.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .utils import Rays, generate_rays


def _load_renderings(root_fp: str, subject_id: str, split: str):
    """Load PNGs + poses (``nerf_synthetic.py:17-50``)."""
    import imageio.v2 as imageio

    data_dir = os.path.join(root_fp, subject_id)
    with open(os.path.join(data_dir, f"transforms_{split}.json")) as fp:
        meta = json.load(fp)
    images, camtoworlds = [], []
    for frame in meta["frames"]:
        fname = os.path.join(data_dir, frame["file_path"] + ".png")
        images.append(imageio.imread(fname))
        camtoworlds.append(frame["transform_matrix"])
    images = np.stack(images, axis=0)
    camtoworlds = np.stack(camtoworlds, axis=0).astype(np.float32)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    return images, camtoworlds, focal


class SubjectLoader:
    """Single-subject loader (``nerf_synthetic.py:53-232``).

    Also accepts pre-loaded arrays via ``images=``/``camtoworlds=``/``focal=``
    (used by the procedural test scene), bypassing disk entirely.
    """

    SPLITS = ["train", "val", "trainval", "test"]
    WIDTH, HEIGHT = 800, 800
    NEAR, FAR = 2.0, 6.0
    OPENGL_CAMERA = True

    def __init__(
        self,
        subject_id: str = "",
        root_fp: str = "",
        split: str = "train",
        color_bkgd_aug: str = "white",
        num_rays: Optional[int] = None,
        near: Optional[float] = None,
        far: Optional[float] = None,
        batch_over_images: bool = True,
        images: Optional[np.ndarray] = None,
        camtoworlds: Optional[np.ndarray] = None,
        focal: Optional[float] = None,
        seed: int = 0,
    ):
        assert split in self.SPLITS, split
        assert color_bkgd_aug in ["white", "black", "random"]
        self.split = split
        self.num_rays = num_rays
        self.near = self.NEAR if near is None else near
        self.far = self.FAR if far is None else far
        self.training = (num_rays is not None) and split in [
            "train",
            "trainval",
        ]
        self.color_bkgd_aug = color_bkgd_aug
        self.batch_over_images = batch_over_images
        self._rng = np.random.default_rng(seed)

        if images is not None:
            self.images = images
            self.camtoworlds = camtoworlds.astype(np.float32)
            self.focal = float(focal)
        elif split == "trainval":
            im_t, c_t, f_t = _load_renderings(root_fp, subject_id, "train")
            im_v, c_v, _ = _load_renderings(root_fp, subject_id, "val")
            self.images = np.concatenate([im_t, im_v])
            self.camtoworlds = np.concatenate([c_t, c_v])
            self.focal = f_t
        else:
            self.images, self.camtoworlds, self.focal = _load_renderings(
                root_fp, subject_id, split
            )
        # Materialize as contiguous HOST memory once: the native sampler
        # (and numpy fancy indexing) otherwise re-copies ~92 MB per fetch
        # if handed a non-contiguous or device-backed array — measured as
        # 160 ms/fetch inside the round-5 bench (np.ascontiguousarray was
        # 32.3 s of a 35 s / 200-step training chunk).
        self.images = np.ascontiguousarray(np.asarray(self.images))
        self.HEIGHT, self.WIDTH = self.images.shape[1:3]
        self.K = np.array(
            [
                [self.focal, 0, self.WIDTH / 2.0],
                [0, self.focal, self.HEIGHT / 2.0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
        assert self.images.shape[1:3] == (self.HEIGHT, self.WIDTH)

    def __len__(self):
        return len(self.images)

    def _native_image_ids(self, seed: int, n_rays: int) -> np.ndarray:
        """Reproduce the native sampler's per-ray image ids (splitmix64)."""
        i = np.arange(n_rays, dtype=np.uint64)
        x = (np.uint64(seed) ^ (i * np.uint64(0x9E3779B97F4A7C15))) + np.uint64(
            0x9E3779B97F4A7C15
        )
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        return (x % np.uint64(len(self.images))).astype(np.int64)

    def update_num_rays(self, num_rays: int):
        """Dynamic ray-batch resizing (``nerf_synthetic.py:161``).

        NOTE: changing this retraces jitted steps — prefer keeping it fixed
        and tuning the sample capacity instead (SURVEY §7 decision 5).
        """
        self.num_rays = num_rays

    def __getitem__(self, index: int):
        return self.fetch_data(index)

    def fetch_data(self, index: int):
        """One batch: random pixels across images (train) or the full image
        (eval).  Returns dict with 'rays', 'pixels', 'color_bkgd'.

        Uses the native OpenMP sampler (``native/rayforge.cpp``) when built
        and applicable (training batches over images); falls back to numpy.
        """
        rng = self._rng
        num_rays = self.num_rays

        if self.training and self.batch_over_images:
            from . import _native

            if _native.available():
                if self.color_bkgd_aug == "random":
                    color_bkgd = rng.random(3).astype(np.float32)
                elif self.color_bkgd_aug == "white":
                    color_bkgd = np.ones(3, np.float32)
                else:
                    color_bkgd = np.zeros(3, np.float32)
                seed = int(rng.integers(0, 2**63 - 1))
                out = _native.sample_rays(
                    self.images,
                    self.camtoworlds,
                    self.K,
                    color_bkgd,
                    seed,
                    num_rays,
                    self.OPENGL_CAMERA,
                )
                if out is not None:
                    o, d, pix = out
                    # image ids are not exposed by the fast path; dynamic
                    # subclasses (timestamps) re-derive them from the seed.
                    self._last_image_id = self._native_image_ids(
                        seed, num_rays
                    )
                    # Host arrays out: the jit boundary transfers them in
                    # one batch; a per-field jnp.asarray here would cost
                    # one tunnel RPC per field per fetch.
                    return {
                        "rays": Rays(origins=o, viewdirs=d),
                        "pixels": pix,
                        "color_bkgd": color_bkgd,
                    }

        if self.training:
            if self.batch_over_images:
                image_id = rng.integers(0, len(self.images), size=(num_rays,))
            else:
                image_id = np.full((num_rays,), index)
            x = rng.integers(0, self.WIDTH, size=(num_rays,))
            y = rng.integers(0, self.HEIGHT, size=(num_rays,))
        else:
            image_id = np.full((self.HEIGHT * self.WIDTH,), index)
            xx, yy = np.meshgrid(
                np.arange(self.WIDTH), np.arange(self.HEIGHT)
            )
            x, y = xx.reshape(-1), yy.reshape(-1)
        self._last_image_id = image_id  # consumed by dynamic subclasses

        rgba = self.images[image_id, y, x].astype(np.float32) / 255.0
        c2w = self.camtoworlds[image_id, :3, :4]
        rays = generate_rays(
            x.astype(np.float32),
            y.astype(np.float32),
            self.K,
            c2w,
            opengl=self.OPENGL_CAMERA,
        )

        if self.training:
            if self.color_bkgd_aug == "random":
                color_bkgd = rng.random(3).astype(np.float32)
            elif self.color_bkgd_aug == "white":
                color_bkgd = np.ones(3, np.float32)
            else:
                color_bkgd = np.zeros(3, np.float32)
        else:
            color_bkgd = np.ones(3, np.float32)

        if rgba.shape[-1] == 4:
            pixels, alpha = rgba[..., :3], rgba[..., 3:]
            pixels = pixels * alpha + color_bkgd * (1.0 - alpha)
        else:
            pixels = rgba

        if not self.training:
            pixels = pixels.reshape(self.HEIGHT, self.WIDTH, 3)
            rays = Rays(
                origins=rays.origins.reshape(self.HEIGHT, self.WIDTH, 3),
                viewdirs=rays.viewdirs.reshape(self.HEIGHT, self.WIDTH, 3),
            )

        # Host arrays out (see the native-path note above).
        return {
            "rays": rays,
            "pixels": pixels,
            "color_bkgd": color_bkgd,
        }
