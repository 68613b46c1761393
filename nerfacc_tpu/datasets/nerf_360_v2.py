"""Mip-NeRF 360 (COLMAP) dataset loader.

Parity target: ``examples/datasets/nerf_360_v2.py`` — COLMAP sparse parsing
(via :mod:`.colmap`, replacing the pycolmap submodule), pinhole-only
assertion, every-8th test split, and ``similarity_from_cameras``
up-axis/recenter/scale normalization.  OpenCV camera convention.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .colmap import load_sparse
from .utils import Rays, generate_rays


def similarity_from_cameras(c2w: np.ndarray, strict_scaling: bool = False):
    """Normalizing similarity transform (``nerf_360_v2.py:140-197``).

    This numerical recipe (up-axis alignment via Rodrigues rotation,
    origin recentering from the camera-axis closest points, median/max
    scale) originates from nerf-factory
    (https://github.com/kakaobrain/nerf-factory), which the reference
    credits; it is reproduced exactly because downstream occupancy-grid
    AABBs depend on this conditioning.
    """
    t = c2w[:, :3, 3]
    R = c2w[:, :3, :3]

    ups = np.sum(R * np.array([0, -1.0, 0]), axis=-1)
    world_up = np.mean(ups, axis=0)
    world_up /= np.linalg.norm(world_up)

    up_camspace = np.array([0.0, -1.0, 0.0])
    c = (up_camspace * world_up).sum()
    cross = np.cross(world_up, up_camspace)
    skew = np.array(
        [
            [0.0, -cross[2], cross[1]],
            [cross[2], 0.0, -cross[0]],
            [-cross[1], cross[0], 0.0],
        ]
    )
    if c > -1:
        R_align = np.eye(3) + skew + (skew @ skew) / (1 + c)
    else:
        R_align = np.array(
            [[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )

    R = R_align @ R
    fwds = np.sum(R * np.array([0, 0.0, 1.0]), axis=-1)
    t = (R_align @ t[..., None])[..., 0]

    nearest = t + (fwds * -t).sum(-1)[:, None] * fwds
    translate = -np.median(nearest, axis=0)

    transform = np.eye(4)
    transform[:3, 3] = translate
    transform[:3, :3] = R_align

    scale_fn = np.max if strict_scaling else np.median
    scale = 1.0 / scale_fn(np.linalg.norm(t + translate, axis=-1))
    return transform, scale


def _load_colmap(root_fp: str, subject_id: str, factor: int = 1):
    """COLMAP loader (``nerf_360_v2.py:25-137``), pinhole-only."""
    import imageio.v2 as imageio

    assert factor in [1, 2, 4, 8]
    data_dir = os.path.join(root_fp, subject_id)
    colmap_dir = os.path.join(data_dir, "sparse/0/")

    cams, imdata = load_sparse(colmap_dir)
    cam = cams[min(cams.keys())]
    K = cam.K.copy()
    K[:2, :] /= factor

    assert cam.model in ("SIMPLE_PINHOLE", "PINHOLE"), (
        "Only support pinhole camera model."
    )

    w2c_mats = np.stack([imdata[k].w2c() for k in imdata])
    camtoworlds = np.linalg.inv(w2c_mats)
    image_names = [imdata[k].name for k in imdata]

    inds = np.argsort(image_names)
    image_names = [image_names[i] for i in inds]
    camtoworlds = camtoworlds[inds]

    image_dir_suffix = f"_{factor}" if factor > 1 else ""
    colmap_image_dir = os.path.join(data_dir, "images")
    image_dir = os.path.join(data_dir, "images" + image_dir_suffix)
    for d in [image_dir, colmap_image_dir]:
        if not os.path.exists(d):
            raise ValueError(f"Image folder {d} does not exist.")
    colmap_files = sorted(os.listdir(colmap_image_dir))
    image_files = sorted(os.listdir(image_dir))
    colmap_to_image = dict(zip(colmap_files, image_files))
    image_paths = [
        os.path.join(image_dir, colmap_to_image[f]) for f in image_names
    ]
    images = np.stack([imageio.imread(x) for x in image_paths], axis=0)

    all_indices = np.arange(images.shape[0])
    split_indices = {
        "test": all_indices[all_indices % 8 == 0],
        "train": all_indices[all_indices % 8 != 0],
    }
    return images, camtoworlds, K, split_indices


class SubjectLoader:
    """Mip-NeRF 360 subject loader (``nerf_360_v2.py:200-364``)."""

    SPLITS = ["train", "test"]
    OPENGL_CAMERA = False

    def __init__(
        self,
        subject_id: str,
        root_fp: str,
        split: str,
        color_bkgd_aug: str = "white",
        num_rays: Optional[int] = None,
        near: Optional[float] = None,
        far: Optional[float] = None,
        batch_over_images: bool = True,
        factor: int = 1,
        seed: int = 0,
    ):
        assert split in self.SPLITS, split
        assert color_bkgd_aug in ["white", "black", "random"]
        self.split = split
        self.num_rays = num_rays
        self.near = near
        self.far = far
        self.training = (num_rays is not None) and split in [
            "train",
            "trainval",
        ]
        self.color_bkgd_aug = color_bkgd_aug
        self.batch_over_images = batch_over_images
        self._rng = np.random.default_rng(seed)

        self.images, self.camtoworlds, self.K, split_indices = _load_colmap(
            root_fp, subject_id, factor
        )
        T, sscale = similarity_from_cameras(
            self.camtoworlds, strict_scaling=False
        )
        self.camtoworlds = np.einsum("nij, ki -> nkj", self.camtoworlds, T)
        self.camtoworlds[:, :3, 3] *= sscale
        indices = split_indices[split]
        self.images = self.images[indices]
        self.camtoworlds = self.camtoworlds[indices].astype(np.float32)
        self.K = self.K.astype(np.float32)
        self.HEIGHT, self.WIDTH = self.images.shape[1:3]

    def __len__(self):
        return len(self.images)

    def update_num_rays(self, num_rays):
        self.num_rays = num_rays

    def __getitem__(self, index):
        return self.fetch_data(index)

    def fetch_data(self, index):
        rng = self._rng
        num_rays = self.num_rays

        if self.training:
            if self.batch_over_images:
                image_id = rng.integers(0, len(self.images), size=(num_rays,))
            else:
                image_id = np.full((num_rays,), index)
            x = rng.integers(0, self.WIDTH, size=(num_rays,))
            y = rng.integers(0, self.HEIGHT, size=(num_rays,))
        else:
            image_id = np.full((self.HEIGHT * self.WIDTH,), index)
            xx, yy = np.meshgrid(np.arange(self.WIDTH), np.arange(self.HEIGHT))
            x, y = xx.reshape(-1), yy.reshape(-1)

        rgb = self.images[image_id, y, x].astype(np.float32) / 255.0
        rgb = rgb[..., :3]
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

        if not self.training:
            rgb = rgb.reshape(self.HEIGHT, self.WIDTH, 3)
            rays = Rays(
                origins=rays.origins.reshape(self.HEIGHT, self.WIDTH, 3),
                viewdirs=rays.viewdirs.reshape(self.HEIGHT, self.WIDTH, 3),
            )

        return {
            "rays": rays,
            "pixels": jnp.asarray(rgb),
            "color_bkgd": jnp.asarray(color_bkgd),
        }
