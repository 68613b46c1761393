"""Proposal-network transmittance estimator (Mip-NeRF 360 style).

Parity target: ``nerfacc/estimators/prop_net.py``.

TPU redesign of the control flow: the reference *inverts* control — the
estimator owns a torch optimizer and calls ``loss.backward()`` inside
``update_every_n_steps`` on a retained autograd graph of cached CDFs
(``prop_net.py:156-193``).  JAX has no retained graphs, so the structure is
flattened (the option SURVEY §3.3 anticipates): ``sampling()`` *returns* the
per-level ``(intervals, cdfs)`` cache as values; ``compute_loss`` is a pure
function of that cache and the final transmittance; the training step takes
``jax.grad`` of ``render_loss + prop_loss`` over ``(field_params,
prop_params)`` jointly and applies two optax optimizers — same two-optimizer
semantics, one compiled step.  Gradient-flow boundaries match the reference:
sample positions are ``stop_gradient``-ed, and the final CDF histogram is
detached before the PDF loss.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..data_specs import RayIntervals
from ..pdf import importance_sampling, searchsorted
from ..volrend import render_transmittance_from_density
from .base import AbstractEstimator

Array = jnp.ndarray

PropCache = List[Tuple[Array, Optional[Array]]]  # [(intervals_vals, cdfs)]


class PropNetEstimator(AbstractEstimator):
    """Proposal-network estimator; parity with ``prop_net.py:17-35``.

    Stateless config object — prop-net parameters and their optax state live
    in the caller's train state (see the flattened control flow above).
    """

    def sampling(
        self,
        prop_sigma_fns: Sequence[Callable],
        prop_samples: Sequence[int],
        num_samples: int,
        n_rays: int,
        near_plane: float,
        far_plane: float,
        sampling_type: str = "lindisp",
        stratified: bool = False,
        requires_grad: bool = False,
        key: Optional[jax.Array] = None,
    ) -> Tuple[Array, Array, PropCache]:
        """Iterative PDF resampling through the proposal levels.

        Parity: ``prop_net.py:37-129``.  ``prop_sigma_fns`` take
        ``(t_starts, t_ends) -> sigmas`` on ``(n_rays, n)`` tensors.  Returns
        ``(t_starts, t_ends, cache)``; the cache replaces the reference's
        ``self.prop_cache`` side channel.  When ``requires_grad`` is False,
        prop densities are wrapped in ``stop_gradient`` (the reference's
        ``set_grad_enabled``) and the cache is returned empty.
        """
        assert len(prop_sigma_fns) == len(prop_samples)
        cdfs = jnp.concatenate(
            [jnp.zeros((n_rays, 1)), jnp.ones((n_rays, 1))], axis=-1
        )
        intervals = RayIntervals(vals=cdfs)
        cache: PropCache = []

        for level_fn, level_samples in zip(prop_sigma_fns, prop_samples):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            intervals, _ = importance_sampling(
                intervals, cdfs, level_samples, stratified, key=sub
            )
            t_vals = _transform_stot(
                sampling_type, intervals.vals, near_plane, far_plane
            )
            t_vals = jax.lax.stop_gradient(t_vals)
            t_starts = t_vals[..., :-1]
            t_ends = t_vals[..., 1:]

            sigmas = level_fn(t_starts, t_ends)
            if not requires_grad:
                sigmas = jax.lax.stop_gradient(sigmas)
            assert sigmas.shape == t_starts.shape
            trans, _ = render_transmittance_from_density(t_starts, t_ends, sigmas)
            cdfs = 1.0 - jnp.concatenate(
                [trans, jnp.zeros_like(trans[:, :1])], axis=-1
            )
            if requires_grad:
                cache.append((intervals.vals, cdfs))
            # Resampling is non-differentiable; the differentiable cdfs live
            # in the cache only.
            intervals = RayIntervals(vals=jax.lax.stop_gradient(intervals.vals))
            cdfs = jax.lax.stop_gradient(cdfs)

        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        intervals, _ = importance_sampling(
            intervals, cdfs, num_samples, stratified, key=sub
        )
        t_vals = _transform_stot(
            sampling_type, intervals.vals, near_plane, far_plane
        )
        t_vals = jax.lax.stop_gradient(t_vals)
        t_starts = t_vals[..., :-1]
        t_ends = t_vals[..., 1:]
        if requires_grad:
            cache.append((intervals.vals, None))
        return t_starts, t_ends, cache

    def compute_loss(
        self, cache: PropCache, trans: Array, loss_scaler: float = 1.0
    ) -> Array:
        """PDF-matching loss between the final weights histogram and each
        proposal histogram.  Parity: ``prop_net.py:131-154``.

        ``trans`` is the final rendering transmittance ``(n_rays, n)``.
        Pure function — differentiable w.r.t. the cached prop cdfs.
        """
        if len(cache) == 0:
            return jnp.zeros(())
        intervals_vals, _ = cache[-1]
        cdfs = 1.0 - jnp.concatenate(
            [trans, jnp.zeros_like(trans[:, :1])], axis=-1
        )
        cdfs = jax.lax.stop_gradient(cdfs)

        loss = 0.0
        for prop_vals, prop_cdfs in cache[:-1][::-1]:
            loss += jnp.mean(
                _pdf_loss(
                    RayIntervals(vals=intervals_vals),
                    cdfs,
                    RayIntervals(vals=prop_vals),
                    prop_cdfs,
                )
            )
        return loss * loss_scaler


def get_proposal_requires_grad_fn(
    target: float = 5.0, num_steps: int = 1000
) -> Callable:
    """Annealed prop-update cadence (``prop_net.py:196-212``)."""
    schedule = lambda s: min(s / num_steps, 1.0) * target
    steps_since_last_grad = 0

    def proposal_requires_grad_fn(step: int) -> bool:
        nonlocal steps_since_last_grad
        target_steps_since_last_grad = schedule(step)
        requires_grad = steps_since_last_grad > target_steps_since_last_grad
        if requires_grad:
            steps_since_last_grad = 0
        steps_since_last_grad += 1
        return requires_grad

    return proposal_requires_grad_fn


def _transform_stot(
    transform_type: str, s_vals: Array, t_min, t_max
) -> Array:
    """s-space [0,1] to t-space warp (``prop_net.py:215-229``)."""
    if transform_type == "uniform":
        _contract, _icontract = (lambda x: x), (lambda x: x)
    elif transform_type == "lindisp":
        _contract, _icontract = (lambda x: 1 / x), (lambda x: 1 / x)
    else:
        raise ValueError(f"Unknown transform_type: {transform_type}")
    s_min, s_max = _contract(t_min), _contract(t_max)
    return _icontract(s_vals * s_max + (1 - s_vals) * s_min)


def _pdf_loss(
    segments_query: RayIntervals,
    cdfs_query: Array,
    segments_key: RayIntervals,
    cdfs_key: Array,
    eps: float = 1e-7,
) -> Array:
    """Histogram-envelope loss (``prop_net.py:232-256``), batched layout."""
    ids_left, ids_right = searchsorted(segments_key, segments_query)
    w = cdfs_query[..., 1:] - cdfs_query[..., :-1]
    ids_left = ids_left[..., :-1]
    ids_right = ids_right[..., 1:]

    w_outer = jnp.take_along_axis(cdfs_key, ids_right, axis=-1) - (
        jnp.take_along_axis(cdfs_key, ids_left, axis=-1)
    )
    return jnp.clip(w - w_outer, min=0) ** 2 / (w + eps)


def _outer(t0_starts, t0_ends, t1_starts, t1_ends, y1):
    """Reference oracle (``prop_net.py:259-296``) for tests."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )
    idx_lo = (
        jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
            t1_starts.reshape(-1, t1_starts.shape[-1]),
            t0_starts.reshape(-1, t0_starts.shape[-1]),
        ).reshape(t0_starts.shape)
        - 1
    )
    idx_lo = jnp.clip(idx_lo, 0, y1.shape[-1] - 1)
    idx_hi = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        t1_ends.reshape(-1, t1_ends.shape[-1]),
        t0_ends.reshape(-1, t0_ends.shape[-1]),
    ).reshape(t0_ends.shape)
    idx_hi = jnp.clip(idx_hi, 0, y1.shape[-1] - 1)
    cy1_lo = jnp.take_along_axis(cy1[..., :-1], idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1[..., 1:], idx_hi, axis=-1)
    return cy1_hi - cy1_lo


def _lossfun_outer(t, w, t_env, w_env):
    """Reference oracle (``prop_net.py:299-313``) for tests."""
    eps = jnp.finfo(t.dtype).eps
    w_outer = _outer(
        t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env
    )
    return jnp.clip(w - w_outer, min=0) ** 2 / (w + eps)
