"""Estimator base (parity: ``nerfacc/estimators/base.py``).

The reference's ``AbstractEstimator`` is an ``nn.Module`` carrying registered
buffers.  TPU-natively, estimators split into a static config object (this
class hierarchy) and an immutable pytree *state* that flows through jitted
functions; methods take and return state explicitly.
"""

from __future__ import annotations


class AbstractEstimator:
    """Base class for sampling-policy estimators."""

    def init(self):
        """Build the initial estimator state pytree."""
        raise NotImplementedError

    def sampling(self, *args, **kwargs):
        raise NotImplementedError
