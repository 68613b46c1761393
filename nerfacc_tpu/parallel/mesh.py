"""Device-mesh utilities for multi-chip / multi-host training.

The reference has **no distributed layer of any kind** (SURVEY §2.11); this
module is the new TPU-native scale-out design (SURVEY §5.8):

- one mesh axis ``data`` spanning all chips (ICI within host, DCN across
  hosts);
- ray batches sharded along ``data``; radiance-field / prop-net parameters
  and occupancy-grid state replicated;
- gradients all-reduced by XLA-inserted ``psum`` collectives (we only
  annotate shardings — the mean-loss over the sharded batch against
  replicated params forces the reduction, riding ICI);
- the occupancy EMA merge is element-wise ``max`` (associative), so the
  sharded occ-probe batch merges into the replicated grid with a max
  collective — matching the EMA-max semantics of ``occ_grid.py:396-398``
  exactly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_rays",
    "replicate",
    "data_sharding",
    "replicated_sharding",
]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = "data"
) -> Mesh:
    """1-D mesh over all (or given) devices on the ``data`` axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf's leading axis across the mesh."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every leaf across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
