"""nerfacc_tpu — TPU-native (JAX/XLA/Pallas) NeRF acceleration toolbox.

A from-scratch rebuild of nerfacc's capabilities for TPU: efficient
volumetric sampling (occupancy-grid skipping, proposal-network resampling)
and differentiable volume rendering over static-shape masked sample tensors,
with sharding-native multi-chip training.

Public API mirrors ``nerfacc/__init__.py:23-46``.
"""

from .cameras import (
    opencv_lens_undistortion,
    opencv_lens_undistortion_fisheye,
)
from .data_specs import RayIntervals, RaySamples
from .estimators.occ_grid import OccGridEstimator, OccGridState
from .estimators.prop_net import (
    PropNetEstimator,
    get_proposal_requires_grad_fn,
)
from .grid import TraversalResults, ray_aabb_intersect, traverse_grids
from .pack import pack_info
from .pdf import importance_sampling, searchsorted
from .scan import exclusive_prod, exclusive_sum, inclusive_prod, inclusive_sum
from .version import __version__
from .volrend import (
    accumulate_along_rays,
    render_transmittance_from_alpha,
    render_transmittance_from_density,
    render_visibility_from_alpha,
    render_visibility_from_density,
    render_weight_from_alpha,
    render_weight_from_density,
    rendering,
)

__all__ = [
    "__version__",
    "inclusive_prod",
    "exclusive_prod",
    "inclusive_sum",
    "exclusive_sum",
    "pack_info",
    "render_visibility_from_alpha",
    "render_visibility_from_density",
    "render_weight_from_alpha",
    "render_weight_from_density",
    "render_transmittance_from_alpha",
    "render_transmittance_from_density",
    "accumulate_along_rays",
    "rendering",
    "importance_sampling",
    "searchsorted",
    "RayIntervals",
    "RaySamples",
    "ray_aabb_intersect",
    "traverse_grids",
    "TraversalResults",
    "OccGridEstimator",
    "OccGridState",
    "PropNetEstimator",
    "get_proposal_requires_grad_fn",
    "opencv_lens_undistortion",
    "opencv_lens_undistortion_fisheye",
]
