"""Differentiable volume rendering over batched or flat ray samples.

Parity target: ``nerfacc/volrend.py`` — the ``rendering()`` orchestrator and
the ``render_{transmittance,weight,visibility}_from_{alpha,density}`` family
plus ``accumulate_along_rays``.

TPU design notes:
- Transmittance is computed as ``exp(-exclusive_sum(sigma*dt))`` (the
  reference's own recommended path, ``volrend.py:197-199``); the alpha path
  uses ``exclusive_prod(1-alpha)`` for API parity.
- Invalid (capacity-padding) samples are expected to carry ``t_start == t_end``
  so ``sigma*dt == 0`` and they are exact no-ops — no masking needed in the
  density path.  For the alpha path, pass ``is_valid`` masks or zero alphas.
- ``accumulate_along_rays`` uses ``jax.ops.segment_sum`` (XLA scatter-add) in
  flat mode; plain sum in batched mode.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pack import pack_info  # noqa: F401  (re-exported for API familiarity)
from .scan import exclusive_prod, exclusive_sum

Array = jnp.ndarray

__all__ = [
    "rendering",
    "render_transmittance_from_alpha",
    "render_transmittance_from_density",
    "render_weight_from_alpha",
    "render_weight_from_density",
    "render_visibility_from_alpha",
    "render_visibility_from_density",
    "accumulate_along_rays",
]


def render_transmittance_from_alpha(
    alphas: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[Array] = None,
) -> Array:
    """T_i = prod_{j<i} (1 - alpha_j).  See ``nerfacc/volrend.py:161-206``."""
    del n_rays  # segment identity comes from ray_indices/packed_info directly
    if ray_indices is not None or packed_info is not None:
        trans = exclusive_prod(
            1.0 - alphas, packed_info=packed_info, ray_indices=ray_indices
        )
    else:
        trans = exclusive_prod(1.0 - alphas)
    if prefix_trans is not None:
        trans = trans * prefix_trans
    return trans


def render_transmittance_from_density(
    t_starts: Array,
    t_ends: Array,
    sigmas: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """T_i = exp(-sum_{j<i} sigma_j dt_j).  See ``nerfacc/volrend.py:209-264``."""
    del n_rays
    sigmas_dt = sigmas * (t_ends - t_starts)
    alphas = 1.0 - jnp.exp(-sigmas_dt)
    if ray_indices is not None or packed_info is not None:
        acc = exclusive_sum(sigmas_dt, packed_info=packed_info, ray_indices=ray_indices)
    else:
        acc = exclusive_sum(sigmas_dt)
    trans = jnp.exp(-acc)
    if prefix_trans is not None:
        trans = trans * prefix_trans
    return trans, alphas


def render_weight_from_alpha(
    alphas: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """w_i = T_i * alpha_i.  See ``nerfacc/volrend.py:267-317``."""
    trans = render_transmittance_from_alpha(
        alphas, packed_info, ray_indices, n_rays, prefix_trans
    )
    return trans * alphas, trans


def render_weight_from_density(
    t_starts: Array,
    t_ends: Array,
    sigmas: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """w_i = T_i * (1 - exp(-sigma_i dt_i)).  See ``nerfacc/volrend.py:320-362``."""
    trans, alphas = render_transmittance_from_density(
        t_starts, t_ends, sigmas, packed_info, ray_indices, n_rays, prefix_trans
    )
    return trans * alphas, trans, alphas


def render_visibility_from_alpha(
    alphas: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 0.0,
    prefix_trans: Optional[Array] = None,
) -> Array:
    """vis = (T >= eps) & (alpha >= thre).  See ``nerfacc/volrend.py:365-420``.

    Not differentiated in practice (the reference wraps it in no_grad); callers
    should use it under ``lax.stop_gradient`` contexts.
    """
    trans = render_transmittance_from_alpha(
        alphas, packed_info, ray_indices, n_rays, prefix_trans
    )
    vis = trans >= early_stop_eps
    # alpha_thre may be a traced scalar (the occ estimator couples it to the
    # running mean of the occupancy grid), so apply it unconditionally; for
    # alpha_thre == 0.0 the comparison is a no-op on non-negative alphas.
    vis = vis & (alphas >= alpha_thre)
    return vis


def render_visibility_from_density(
    t_starts: Array,
    t_ends: Array,
    sigmas: Array,
    packed_info: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 0.0,
    prefix_trans: Optional[Array] = None,
) -> Array:
    """Visibility from density; see ``nerfacc/volrend.py:423-480``."""
    trans, alphas = render_transmittance_from_density(
        t_starts, t_ends, sigmas, packed_info, ray_indices, n_rays, prefix_trans
    )
    vis = trans >= early_stop_eps
    vis = vis & (alphas >= alpha_thre)
    return vis


def accumulate_along_rays(
    weights: Array,
    values: Optional[Array] = None,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
) -> Array:
    """sum_i w_i v_i per ray.  See ``nerfacc/volrend.py:483-547``.

    Flat mode uses ``segment_sum`` (XLA scatter-add — the analogue of the
    reference's ``index_add_``).  ``n_rays`` must be a static int.
    """
    if values is None:
        src = weights[..., None]
    else:
        assert values.ndim == weights.ndim + 1
        src = weights[..., None] * values
    if ray_indices is not None:
        assert n_rays is not None, "n_rays must be provided with ray_indices"
        assert weights.ndim == 1, "weights must be flattened"
        return jax.ops.segment_sum(src, ray_indices, num_segments=n_rays)
    return jnp.sum(src, axis=-2)


def _accumulate_sorted(
    src: Array, seg_starts: Array, seg_counts: Array
) -> Array:
    """Per-ray sums of ``src (capacity, k)`` whose rows are grouped by ray in
    slot ranges ``[seg_starts, seg_starts + seg_counts)`` (sorted layout from
    :func:`~nerfacc_tpu.grid.traverse_and_compact`).

    One cumulative sum + two boundary gathers (n_rays indices) replace the
    ``segment_sum`` scatter-add (capacity indices) — scatter-adds cost
    ~8-20 ns *per index* on v5e, so for 2^18 samples over 8k rays this turns
    ~5 ms of scatter into ~0.3 ms of vector scan.  Differentiable by
    autodiff (cumsum VJP = reversed cumsum; gather VJP = n_rays-row scatter).

    PRECISION: each ray's sum is a difference of one *global* f32 prefix
    sum, so its absolute error scales with the global prefix magnitude —
    ulp ~1e-3 near prefix ~1e4 (e.g. 16k-ray weight batches), hitting
    late-batch rays hardest, vs per-segment scatter-add whose error scales
    with per-ray magnitude only.  Acceptable for rendering accumulations
    (weights/rgb in [0,1]; measured no PSNR regression at bench scale); if
    quality targets tighten, reset the cumsum per block or use compensated
    (two-sum) accumulation.
    """
    csum = jnp.cumsum(src, axis=0)
    csum = jnp.concatenate([jnp.zeros_like(csum[:1]), csum], axis=0)
    return jnp.take(csum, seg_starts + seg_counts, axis=0) - jnp.take(
        csum, seg_starts, axis=0
    )


@jax.custom_vjp
def _accumulate_sorted_g(src, seg_starts, seg_counts, ray_indices, valid):
    """:func:`_accumulate_sorted` with the EXACT segment-sum backward.

    Autodiffing the cumsum form costs a reversed cumsum plus a boundary
    scatter-add of ``dout`` into the (capacity+1, k) prefix cotangent —
    and that scatter lands as a 2-D *column* scatter in the prefix's
    lane-major layout (trace: fusion.21 = 1.35 ms + reduce-window.16 =
    0.45 ms per step at 512k x 5).  The true VJP of a sorted segment sum
    is just ``dsrc[i] = dout[ray_of_slot_i]`` — one row gather by the
    ``ray_indices`` the caller already holds, masked by segment
    membership (``valid``).  Exact (no prefix-difference rounding) and
    scatter-free.
    """
    return _accumulate_sorted(src, seg_starts, seg_counts)


def _accumulate_sorted_g_fwd(src, seg_starts, seg_counts, ray_indices, valid):
    out = _accumulate_sorted(src, seg_starts, seg_counts)
    return out, (seg_starts, seg_counts, ray_indices, valid)


def _accumulate_sorted_g_bwd(res, dout):
    seg_starts, seg_counts, ray_indices, valid = res
    n_rays = dout.shape[0]
    d = jnp.take(dout, jnp.clip(ray_indices, 0, n_rays - 1), axis=0)
    d = jnp.where(valid[:, None], d, 0.0)

    def f0(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return d, f0(seg_starts), f0(seg_counts), f0(ray_indices), f0(valid)


_accumulate_sorted_g.defvjp(_accumulate_sorted_g_fwd, _accumulate_sorted_g_bwd)


def rendering(
    t_starts: Array,
    t_ends: Array,
    ray_indices: Optional[Array] = None,
    n_rays: Optional[int] = None,
    rgb_sigma_fn: Optional[Callable] = None,
    rgb_alpha_fn: Optional[Callable] = None,
    render_bkgd: Optional[Array] = None,
    is_valid: Optional[Array] = None,
    expected_depth: bool = True,
    seg_bounds: Optional[Tuple[Array, Array]] = None,
) -> Tuple[Array, Array, Array, Dict]:
    """Volume rendering orchestrator.  See ``nerfacc/volrend.py:14-158``.

    The user network is invoked through ``rgb_sigma_fn(t_starts, t_ends,
    ray_indices)`` (or ``rgb_alpha_fn``) exactly as in the reference.  Extra
    TPU-native argument ``is_valid`` masks capacity padding: densities/alphas
    at invalid slots are zeroed (for well-formed inputs with
    ``t_start == t_end`` at padding this is redundant for the sigma path but
    required for the alpha path).

    ``seg_bounds = (seg_starts, seg_counts)`` may be passed when the flat
    samples are grouped by ray (sorted — e.g. straight from
    :func:`~nerfacc_tpu.grid.traverse_and_compact`); the three per-ray
    accumulations then run as one fused cumsum + boundary gathers instead of
    three scatter-adds (see :func:`_accumulate_sorted`).

    Returns ``(colors (n_rays,3), opacities (n_rays,1), depths (n_rays,1),
    extras)``.
    """
    if ray_indices is not None:
        assert t_starts.shape == t_ends.shape == ray_indices.shape, (
            "t_starts, t_ends and ray_indices must have the same shape"
        )
    if rgb_sigma_fn is None and rgb_alpha_fn is None:
        raise ValueError(
            "At least one of `rgb_sigma_fn` and `rgb_alpha_fn` should be specified."
        )

    if rgb_sigma_fn is not None:
        rgbs, sigmas = rgb_sigma_fn(t_starts, t_ends, ray_indices)
        assert rgbs.shape[-1] == 3, f"rgbs must have 3 channels, got {rgbs.shape}"
        assert sigmas.shape == t_starts.shape
        if is_valid is not None:
            sigmas = jnp.where(is_valid, sigmas, 0.0)
        weights, trans, alphas = render_weight_from_density(
            t_starts, t_ends, sigmas, ray_indices=ray_indices, n_rays=n_rays
        )
        extras = {
            "weights": weights,
            "alphas": alphas,
            "trans": trans,
            "sigmas": sigmas,
            "rgbs": rgbs,
        }
    else:
        rgbs, alphas = rgb_alpha_fn(t_starts, t_ends, ray_indices)
        assert rgbs.shape[-1] == 3, f"rgbs must have 3 channels, got {rgbs.shape}"
        assert alphas.shape == t_starts.shape
        if is_valid is not None:
            alphas = jnp.where(is_valid, alphas, 0.0)
        weights, trans = render_weight_from_alpha(
            alphas, ray_indices=ray_indices, n_rays=n_rays
        )
        extras = {
            "weights": weights,
            "trans": trans,
            "rgbs": rgbs,
            "alphas": alphas,
        }

    if seg_bounds is not None and ray_indices is not None:
        src = jnp.concatenate(
            [
                weights[:, None] * rgbs,
                weights[:, None],
                (weights * (t_starts + t_ends) / 2.0)[:, None],
            ],
            axis=-1,
        )  # (capacity, 5)
        # Default "gather" since the round-5 device A/B (13.13M vs 13.05M
        # samples/s, step 37.73 vs 38.01 ms) — and the gather VJP is exact
        # where the cumsum VJP inherits prefix-difference rounding.
        if is_valid is not None and os.environ.get(
            "NERFACC_ACCUM_BWD", "gather"
        ) == "gather":
            acc = _accumulate_sorted_g(
                src, *seg_bounds, ray_indices, is_valid
            )
        else:
            acc = _accumulate_sorted(src, *seg_bounds)
        colors = acc[:, 0:3]
        opacities = acc[:, 3:4]
        depths = acc[:, 4:5]
    else:
        colors = accumulate_along_rays(
            weights, values=rgbs, ray_indices=ray_indices, n_rays=n_rays
        )
        opacities = accumulate_along_rays(
            weights, values=None, ray_indices=ray_indices, n_rays=n_rays
        )
        depths = accumulate_along_rays(
            weights,
            values=((t_starts + t_ends) / 2.0)[..., None],
            ray_indices=ray_indices,
            n_rays=n_rays,
        )
    if expected_depth:
        depths = depths / jnp.clip(opacities, min=jnp.finfo(rgbs.dtype).eps)

    if render_bkgd is not None:
        colors = colors + render_bkgd * (1.0 - opacities)

    return colors, opacities, depths, extras
