"""Procedural analytic test scene ("jelly" blobs) with exact renders.

There is no substitute dataset shipped in-repo (and the NeRF-Synthetic blend
files cannot be redistributed), so this module generates a self-contained
training target: an analytic emissive density field rendered to RGBA images
by dense (near-exact) ray marching.  It plugs into
:class:`~nerfacc_tpu.datasets.nerf_synthetic.SubjectLoader` via its
``images=/camtoworlds=/focal=`` constructor path, giving the repo an
end-to-end PSNR benchmark that is runnable anywhere (the BASELINE.json
CPU-runnable conformance config).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Scene definition: gaussian-ish blobs (center, radius, density, rgb).
_BLOBS = np.array(
    [
        # cx, cy, cz, radius, density, r, g, b
        [0.0, 0.0, 0.0, 0.45, 40.0, 0.85, 0.25, 0.2],
        [0.5, 0.3, -0.2, 0.3, 30.0, 0.2, 0.7, 0.9],
        [-0.5, -0.2, 0.35, 0.25, 50.0, 0.95, 0.8, 0.2],
        [0.1, -0.5, -0.4, 0.2, 60.0, 0.3, 0.9, 0.35],
        [-0.25, 0.55, 0.1, 0.22, 45.0, 0.7, 0.4, 0.9],
    ],
    dtype=np.float32,
)


def scene_density(x: Array) -> Array:
    """Analytic density at points ``x`` (..., 3)."""
    c = jnp.asarray(_BLOBS[:, :3])
    r = jnp.asarray(_BLOBS[:, 3])
    d = jnp.asarray(_BLOBS[:, 4])
    dist2 = jnp.sum((x[..., None, :] - c) ** 2, axis=-1)  # (..., B)
    # smooth bump: density * max(0, 1 - (dist/r)^2)^2
    u = jnp.clip(1.0 - dist2 / (r**2), min=0.0)
    return jnp.sum(d * u * u, axis=-1)


def scene_rgb_density(x: Array, detail: float = 0.0) -> Tuple[Array, Array]:
    """Analytic (rgb, density) at points ``x``.

    ``detail > 0`` adds multi-octave color texture (and density ripples)
    whose finest wavelength (~0.03 scene units ≈ 9 px at 800x800 from the
    default camera ring) exceeds the coarse hash levels' resolving power —
    the reference-class quality gate (33 dB on 800x800 Lego,
    ``docs/source/examples/static/ngp.rst:17-48``) needs a scene where
    table capacity and fine levels actually matter.  ``detail=0`` keeps the
    original smooth-blob scene (tests/smoke paths).
    """
    c = jnp.asarray(_BLOBS[:, :3])
    r = jnp.asarray(_BLOBS[:, 3])
    d = jnp.asarray(_BLOBS[:, 4])
    rgb = jnp.asarray(_BLOBS[:, 5:8])
    dist2 = jnp.sum((x[..., None, :] - c) ** 2, axis=-1)
    u = jnp.clip(1.0 - dist2 / (r**2), min=0.0)
    w = d * u * u  # (..., B)
    sigma = jnp.sum(w, axis=-1)
    colors = jnp.sum(w[..., None] * rgb, axis=-2) / jnp.clip(
        sigma[..., None], min=1e-8
    )
    # subtle position-dependent shading so views differ
    xx, yy, zz = x[..., :1], x[..., 1:2], x[..., 2:3]
    shade = 0.75 + 0.25 * jnp.sin(4.0 * xx) * jnp.cos(4.0 * yy)
    if detail > 0.0:
        octaves = (
            0.22 * jnp.sin(20.0 * xx + 1.0) * jnp.sin(20.0 * zz)
            + 0.14 * jnp.sin(55.0 * yy + 2.0) * jnp.cos(55.0 * zz + 1.0)
            + 0.09 * jnp.sin(200.0 * xx + 0.7) * jnp.sin(200.0 * yy + 1.3)
        )
        shade = shade + detail * octaves
        # Density ripples carve fine geometric structure into the blob
        # surfaces (specular-free but high-frequency opacity edges).
        sigma = sigma * (
            1.0
            + 0.35
            * detail
            * jnp.sin(40.0 * xx[..., 0] + 2.0 * yy[..., 0])
            * jnp.sin(40.0 * zz[..., 0])
        )
    return jnp.clip(colors * shade, 0.0, 1.0), sigma


def _pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Blender-style look-at-origin camera pose (OpenGL convention)."""
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rot_phi = np.eye(4, dtype=np.float32)
    rot_phi[1, 1] = np.cos(phi)
    rot_phi[1, 2] = -np.sin(phi)
    rot_phi[2, 1] = np.sin(phi)
    rot_phi[2, 2] = np.cos(phi)
    rot_theta = np.eye(4, dtype=np.float32)
    rot_theta[0, 0] = np.cos(theta)
    rot_theta[0, 2] = -np.sin(theta)
    rot_theta[2, 0] = np.sin(theta)
    rot_theta[2, 2] = np.cos(theta)
    return rot_theta @ rot_phi @ trans


@functools.partial(jax.jit, static_argnames=("n_steps", "detail"))
def _render_pose_chunk(
    origins, viewdirs, near, far, detail: float = 0.0, n_steps: int = 512
):
    t = jnp.linspace(near, far, n_steps + 1)
    t0, t1 = t[:-1], t[1:]
    tm = (t0 + t1) / 2.0
    x = origins[:, None, :] + tm[None, :, None] * viewdirs[:, None, :]
    rgbs, sigmas = scene_rgb_density(x, detail)
    dt = (t1 - t0)[None, :]
    alphas = 1.0 - jnp.exp(-sigmas * dt)
    trans = jnp.exp(-jnp.cumsum(jnp.pad(sigmas * dt, ((0, 0), (1, 0)))[:, :-1], axis=-1))
    weights = trans * alphas
    color = jnp.sum(weights[..., None] * rgbs, axis=-2)
    opacity = jnp.sum(weights, axis=-1, keepdims=True)
    return color, opacity


def generate_dataset(
    n_train: int = 24,
    n_test: int = 4,
    width: int = 128,
    height: int = 128,
    radius: float = 2.5,
    seed: int = 0,
    detail: float = 0.0,
):
    """Render the analytic scene from poses on a sphere.

    Returns ``(train_images, train_c2w, test_images, test_c2w, focal)`` with
    uint8 RGBA images — drop-in for ``SubjectLoader(images=..., ...)``.
    Rendering is chunked (65536 rays) so reference-class resolutions
    (800x800) stay within device memory.
    """
    from .utils import generate_rays

    rng = np.random.default_rng(seed)
    focal = 0.9 * width
    K = np.array(
        [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
        dtype=np.float32,
    )
    chunk = 65536

    def render_split(n_views, phase):
        images, poses = [], []
        for i in range(n_views):
            theta = 2 * np.pi * (i / n_views) + phase
            phi = -np.pi / 5 - 0.4 * rng.random()
            c2w = _pose_spherical(theta, phi, radius)
            xx, yy = np.meshgrid(np.arange(width), np.arange(height))
            rays = generate_rays(
                xx.reshape(-1).astype(np.float32),
                yy.reshape(-1).astype(np.float32),
                K,
                c2w[:3, :4],
                opengl=True,
            )
            n = rays.origins.shape[0]
            n_pad = (-n) % chunk
            o = np.concatenate(
                [rays.origins, np.broadcast_to(rays.origins[-1:], (n_pad, 3))]
            )
            d = np.concatenate(
                [rays.viewdirs, np.broadcast_to(rays.viewdirs[-1:], (n_pad, 3))]
            )
            parts = [
                _render_pose_chunk(
                    jnp.asarray(o[j : j + chunk]),
                    jnp.asarray(d[j : j + chunk]),
                    radius - 1.2,
                    radius + 1.2,
                    detail=detail,
                )
                for j in range(0, n + n_pad, chunk)
            ]
            color = jnp.concatenate([p[0] for p in parts])[:n]
            opacity = jnp.concatenate([p[1] for p in parts])[:n]
            rgba = np.concatenate(
                [np.asarray(color), np.asarray(opacity)], axis=-1
            ).reshape(height, width, 4)
            images.append((np.clip(rgba, 0, 1) * 255).astype(np.uint8))
            poses.append(c2w)
        return np.stack(images), np.stack(poses)

    train_images, train_c2w = render_split(n_train, 0.0)
    test_images, test_c2w = render_split(n_test, 0.3)
    return train_images, train_c2w, test_images, test_c2w, focal


def scene_rgb_density_t(x: Array, t: Array) -> Tuple[Array, Array]:
    """Time-animated variant: blobs orbit slightly with time ``t`` in [0,1]
    (drives the dynamic T-NeRF benchmark)."""
    c = jnp.asarray(_BLOBS[:, :3])
    r = jnp.asarray(_BLOBS[:, 3])
    d = jnp.asarray(_BLOBS[:, 4])
    rgb = jnp.asarray(_BLOBS[:, 5:8])
    ang = 0.6 * jnp.sin(2 * jnp.pi * t)  # scalar or broadcastable
    rot = jnp.stack(
        [
            jnp.stack([jnp.cos(ang), -jnp.sin(ang)], -1),
            jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1),
        ],
        -2,
    )  # (..., 2, 2)
    c_xy = jnp.einsum("...ij,bj->...bi", rot, c[:, :2])
    c_t = jnp.concatenate(
        [c_xy, jnp.broadcast_to(c[:, 2:], c_xy.shape[:-1] + (1,))], axis=-1
    )
    dist2 = jnp.sum((x[..., None, :] - c_t) ** 2, axis=-1)
    u = jnp.clip(1.0 - dist2 / (r**2), min=0.0)
    w = d * u * u
    sigma = jnp.sum(w, axis=-1)
    colors = jnp.sum(w[..., None] * rgb, axis=-2) / jnp.clip(
        sigma[..., None], min=1e-8
    )
    return jnp.clip(colors, 0.0, 1.0), sigma


@jax.jit
def _render_pose_chunk_t(origins, viewdirs, t, near, far, n_steps: int = 512):
    tt = jnp.linspace(near, far, n_steps + 1)
    t0, t1 = tt[:-1], tt[1:]
    tm = (t0 + t1) / 2.0
    x = origins[:, None, :] + tm[None, :, None] * viewdirs[:, None, :]
    rgbs, sigmas = scene_rgb_density_t(x, t)
    dt = (t1 - t0)[None, :]
    alphas = 1.0 - jnp.exp(-sigmas * dt)
    trans = jnp.exp(
        -jnp.cumsum(jnp.pad(sigmas * dt, ((0, 0), (1, 0)))[:, :-1], axis=-1)
    )
    weights = trans * alphas
    color = jnp.sum(weights[..., None] * rgbs, axis=-2)
    opacity = jnp.sum(weights, axis=-1, keepdims=True)
    return color, opacity


def make_dynamic_loaders(
    num_rays: int = 1024,
    width: int = 96,
    height: int = 96,
    n_train: int = 24,
    n_test: int = 2,
    radius: float = 2.5,
):
    """Procedural dynamic (time-varying) train/test loaders for T-NeRF."""
    from .dnerf_synthetic import SubjectLoader as DynLoader
    from .utils import generate_rays

    focal = 0.9 * width
    K = np.array(
        [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
        dtype=np.float32,
    )
    rng = np.random.default_rng(0)

    def render_split(n_views, phase):
        images, poses, times = [], [], []
        for i in range(n_views):
            t = i / max(n_views - 1, 1)
            theta = 2 * np.pi * (i / n_views) + phase
            phi = -np.pi / 5 - 0.4 * rng.random()
            c2w = _pose_spherical(theta, phi, radius)
            xx, yy = np.meshgrid(np.arange(width), np.arange(height))
            rays = generate_rays(
                xx.reshape(-1).astype(np.float32),
                yy.reshape(-1).astype(np.float32),
                K,
                c2w[:3, :4],
                opengl=True,
            )
            color, opacity = _render_pose_chunk_t(
                rays.origins, rays.viewdirs, jnp.float32(t),
                radius - 1.2, radius + 1.2,
            )
            rgba = np.concatenate(
                [np.asarray(color), np.asarray(opacity)], axis=-1
            ).reshape(height, width, 4)
            images.append((np.clip(rgba, 0, 1) * 255).astype(np.uint8))
            poses.append(c2w)
            times.append(t)
        return np.stack(images), np.stack(poses), np.asarray(times, np.float32)

    tr_im, tr_c2w, tr_t = render_split(n_train, 0.0)
    te_im, te_c2w, te_t = render_split(n_test, 0.3)
    train = DynLoader(
        split="train", num_rays=num_rays, images=tr_im, camtoworlds=tr_c2w,
        focal=focal, timestamps=tr_t, near=1.3, far=3.7,
    )
    test = DynLoader(
        split="test", images=te_im, camtoworlds=te_c2w, focal=focal,
        timestamps=te_t, near=1.3, far=3.7,
    )
    return train, test


def make_loaders(
    num_rays: int = 1024,
    width: int = 128,
    height: int = 128,
    n_train: int = 24,
    n_test: int = 2,
    detail: float = 0.0,
):
    """Procedural train/test SubjectLoaders (aabb ~ [-1,1]^3, near/far 1.3/3.7).

    ``detail=1.0`` selects the textured reference-class-difficulty scene
    (see :func:`scene_rgb_density`)."""
    from .nerf_synthetic import SubjectLoader

    tr_im, tr_c2w, te_im, te_c2w, focal = generate_dataset(
        n_train=n_train, n_test=n_test, width=width, height=height,
        detail=detail,
    )
    train = SubjectLoader(
        split="train",
        num_rays=num_rays,
        images=tr_im,
        camtoworlds=tr_c2w,
        focal=focal,
        near=1.3,
        far=3.7,
    )
    test = SubjectLoader(
        split="test",
        images=te_im,
        camtoworlds=te_c2w,
        focal=focal,
        near=1.3,
        far=3.7,
    )
    return train, test
