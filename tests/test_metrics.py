"""SSIM / MS-SSIM eval metrics (the documented LPIPS substitute —
reference evaluates PSNR + LPIPS-vgg, train_ngp_nerf_occ.py:146-148)."""

import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.utils.metrics import ms_ssim, psnr, ssim


def _img(seed, h=64, w=64):
    return jnp.asarray(
        np.random.default_rng(seed).random((h, w, 3), dtype=np.float32)
    )


def test_ssim_identity_is_one():
    a = _img(0)
    np.testing.assert_allclose(float(ssim(a, a)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(ms_ssim(a, a)), 1.0, atol=1e-4)


def test_ssim_orders_degradations():
    """More noise -> lower SSIM/MS-SSIM; metrics in [-1, 1]."""
    rng = np.random.default_rng(1)
    # smooth structured image (noise on a smooth image, not pure noise)
    yy, xx = np.mgrid[0:96, 0:96] / 96.0
    base = np.stack([np.sin(6 * xx), np.cos(5 * yy), xx * yy], -1)
    base = ((base - base.min()) / (base.max() - base.min())).astype(
        np.float32
    )
    a = jnp.asarray(base)
    n1 = jnp.asarray(
        np.clip(base + rng.normal(0, 0.03, base.shape), 0, 1).astype(
            np.float32
        )
    )
    n2 = jnp.asarray(
        np.clip(base + rng.normal(0, 0.15, base.shape), 0, 1).astype(
            np.float32
        )
    )
    s1, s2 = float(ssim(a, n1)), float(ssim(a, n2))
    m1, m2 = float(ms_ssim(a, n1)), float(ms_ssim(a, n2))
    assert 1 > s1 > s2 > -1
    assert 1 > m1 > m2 >= 0
    assert float(psnr(a, n1)) > float(psnr(a, n2))


def test_ssim_gaussian_window_oracle():
    """Pin SSIM against a direct numpy implementation on a small image."""
    rng = np.random.default_rng(2)
    a = rng.random((32, 32, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    size, sigma = 11, 1.5
    x = np.arange(size) - 5
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(im):
        h, w = im.shape
        out = np.zeros((h - 10, w - 10))
        for i in range(h - 10):
            for j in range(w - 10):
                out[i, j] = (im[i : i + 11, j : j + 11] * win).sum()
        return out

    ia, ib = a[..., 0].astype(np.float64), b[..., 0].astype(np.float64)
    mu_a, mu_b = filt(ia), filt(ib)
    va = filt(ia * ia) - mu_a**2
    vb = filt(ib * ib) - mu_b**2
    cov = filt(ia * ib) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    want = (
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    ).mean()
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ms_ssim_small_image_fewer_scales():
    a = _img(3, 20, 20)
    v = float(ms_ssim(a, a))
    np.testing.assert_allclose(v, 1.0, atol=1e-4)


def test_batched():
    a = jnp.stack([_img(4), _img(5)])
    b = jnp.stack([_img(4), _img(6)])
    s = ssim(a, b)
    assert s.shape == (2,)
    np.testing.assert_allclose(float(s[0]), 1.0, atol=1e-5)
    assert float(s[1]) < 0.99
