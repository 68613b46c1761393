"""TPU Pallas kernels for the traversal/query hot path.

These kernels exist because XLA's HBM gather costs ~7 ns *per index* on v5e
regardless of row width, and occupancy queries during grid traversal are the
dominant per-index consumer in the train step.  The binary occupancy grid is
tiny (128^3 bits = 256 KB bit-packed), so a Pallas kernel can hold it entirely
in VMEM and answer queries with vector-unit lane gathers instead of HBM
gathers.  Reference anchor: the CUDA DDA reads the grid through L2 the same
way (``nerfacc/cuda/csrc/grid.cu:68-275``).
"""

from .occ_query import (
    bitpack_grid,
    occupancy_query_pallas,
    occupancy_query_ref,
)
from .table_grad import (
    hash_table_lookup_sized,
    table_grad_ref,
    table_grad_sorted,
)

__all__ = [
    "bitpack_grid",
    "occupancy_query_pallas",
    "occupancy_query_ref",
    "hash_table_lookup_sized",
    "table_grad_ref",
    "table_grad_sorted",
]
