from .mesh import (
    data_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_rays,
)
from .train import make_parallel_occ_update, make_parallel_train_step

__all__ = [
    "make_mesh",
    "shard_rays",
    "replicate",
    "data_sharding",
    "replicated_sharding",
    "make_parallel_train_step",
    "make_parallel_occ_update",
]
