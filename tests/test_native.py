"""Native input pipeline (rayforge) vs numpy-path equivalence.

Skipped when native/librayforge.so is not built (make -C native).
"""

import numpy as np
import pytest

from nerfacc_tpu.datasets import _native


pytestmark = pytest.mark.skipif(
    not _native.available(), reason="librayforge.so not built"
)


def test_native_rays_geometry():
    rng = np.random.default_rng(0)
    n_imgs, h, w = 3, 16, 16
    images = rng.integers(0, 255, (n_imgs, h, w, 4), dtype=np.uint8)
    # simple camera: identity rotation, distinct centers
    c2w = np.zeros((n_imgs, 3, 4), np.float32)
    c2w[:, :3, :3] = np.eye(3)
    c2w[:, :3, 3] = rng.random((n_imgs, 3))
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
    bkgd = np.ones(3, np.float32)

    o, d, pix = _native.sample_rays(images, c2w, K, bkgd, 42, 256, True)
    # unit directions
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # origins are camera centers
    assert all(
        np.isclose(o[i], c2w[:, :3, 3], atol=1e-6).all(axis=-1).any()
        for i in range(16)
    )
    # pixels composited into [0, 1]
    assert pix.min() >= 0.0 and pix.max() <= 1.0
    # deterministic in seed
    o2, d2, pix2 = _native.sample_rays(images, c2w, K, bkgd, 42, 256, True)
    np.testing.assert_array_equal(pix, pix2)
    np.testing.assert_array_equal(o, o2)


def test_native_image_id_reconstruction():
    """The python-side splitmix64 reimplementation must match the C++ one:
    pixels sampled for ray i must come from image _native_image_ids[i]."""
    from nerfacc_tpu.datasets.nerf_synthetic import SubjectLoader

    rng = np.random.default_rng(1)
    n_imgs, h, w = 4, 8, 8
    # constant-color images so the pixel identifies the image
    images = np.stack(
        [np.full((h, w, 4), 60 * i + 40, np.uint8) for i in range(n_imgs)]
    )
    images[..., 3] = 255
    c2w = np.zeros((n_imgs, 3, 4), np.float32)
    c2w[:, :3, :3] = np.eye(3)
    loader = SubjectLoader(
        split="train",
        num_rays=128,
        images=images,
        camtoworlds=c2w,
        focal=10.0,
        color_bkgd_aug="black",
    )
    batch = loader.fetch_data(0)
    ids = loader._last_image_id
    expect = (60 * np.asarray(ids) + 40) / 255.0
    np.testing.assert_allclose(
        np.asarray(batch["pixels"])[:, 0], expect, atol=1e-6
    )
