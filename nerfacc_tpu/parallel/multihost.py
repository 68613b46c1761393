"""Multi-host (multi-process) scale-out: DCN x ICI meshes + per-host input.

The reference is strictly single-process/single-GPU (SURVEY §2.11); this is
the TPU-native scale-out design for pod slices (SURVEY §5.8):

- ``initialize_distributed`` wraps ``jax.distributed.initialize`` (the
  multi-controller entry every host calls before touching devices);
- ``make_hybrid_mesh`` builds a 2-D ``(hosts, chips)`` mesh whose outer axis
  maps to DCN (cross-host network) and inner axis to ICI, via
  ``mesh_utils.create_hybrid_device_mesh``.  Ray-batch data parallelism
  shards over BOTH axes — the gradient ``psum`` then reduces over ICI first
  and crosses DCN only once per host (XLA's hierarchical collective), which
  is what the >85% 1->2-host scaling target needs;
- ``host_local_rays_to_global`` turns each host's *locally loaded* ray batch
  into one global sharded array (per-host input pipeline: no host ever
  materializes the full batch).

On a single process (this dev environment, and CI's virtual CPU mesh) every
helper degrades gracefully: ``initialize_distributed`` is a no-op,
``make_hybrid_mesh`` reshapes the local devices into ``(1, n)`` —
so the same training script runs unchanged from 1 chip to a pod.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_hybrid_mesh",
    "host_local_rays_to_global",
    "process_local_batch_size",
]

DCN_AXIS = "hosts"
ICI_AXIS = "chips"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-controller runtime; call once per host, before any
    device use.  On TPU pods all arguments are auto-detected from the
    environment; single-process runs skip initialization entirely.

    Returns ``(process_index, process_count)``.
    """
    # IMPORTANT: must not touch the backend (jax.devices/process_count/...)
    # before jax.distributed.initialize — backend init pins a single-process
    # runtime and initialize() then raises.
    already = jax.distributed.is_initialized()
    want_multi = (
        num_processes is not None and num_processes > 1
    ) or coordinator_address is not None
    if not already and want_multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_hybrid_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    dcn_axis: str = DCN_AXIS,
    ici_axis: str = ICI_AXIS,
    hosts: Optional[int] = None,
) -> Mesh:
    """2-D ``(hosts, chips)`` mesh: outer axis across processes (DCN), inner
    axis within each process (ICI).

    With one process, ``hosts`` (default 1) slices the local devices into a
    simulated host axis — how the virtual 8-CPU test mesh exercises the
    multi-host code path without multiple processes.
    """
    if devices is None and jax.process_count() > 1:
        n_hosts = jax.process_count()
        per_host = jax.local_device_count()
        try:
            mesh_devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, per_host),
                dcn_mesh_shape=(n_hosts, 1),
            )
        except ValueError:
            # Backends without slice_index (CPU multi-process; some
            # single-slice topologies): group by process — rows are hosts
            # (DCN), columns are each host's local devices (ICI).
            devs = sorted(
                jax.devices(), key=lambda d: (d.process_index, d.id)
            )
            mesh_devices = np.asarray(devs).reshape(n_hosts, per_host)
        return Mesh(mesh_devices, (dcn_axis, ici_axis))

    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    h = int(hosts or 1)
    assert n % h == 0, f"{n} devices not divisible into {h} hosts"
    arr = np.asarray(devices).reshape(h, n // h)
    return Mesh(arr, (dcn_axis, ici_axis))


def data_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading (ray) axis over every mesh axis."""
    return P(tuple(mesh.axis_names))


def process_local_batch_size(global_batch: int) -> int:
    """Rays this host must load for a given global ray-batch size."""
    count = jax.process_count()
    assert global_batch % count == 0, (
        f"global batch {global_batch} not divisible by {count} hosts"
    )
    return global_batch // count


def host_local_rays_to_global(mesh: Mesh, tree: Any) -> Any:
    """Assemble per-host ray shards into global arrays sharded on the
    leading axis over the whole mesh.

    Each host passes only the rays *it* loaded
    (``process_local_batch_size(global)`` of them); no host ever holds the
    global batch.  Single-process: equivalent to ``device_put`` with the
    data sharding.
    """
    sharding = NamedSharding(mesh, data_spec(mesh))

    def to_global(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(to_global, tree)
