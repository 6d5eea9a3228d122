"""Multi-chip scaling: device meshes, ray/detector sharding, slab sharding,
multi-host (DCN) bootstrap."""

from .sharding import (
    make_mesh,
    shard_drr,
    make_sharded_render,
    slab_sharded_raycast,
    slab_sharded_joseph,
    slab_sharded_siddon,
    make_reconstruction_step,
)
from .multihost import (
    initialize_distributed,
    global_mesh,
    local_batch_to_global,
    process_local_slice,
)

__all__ = [
    "make_mesh",
    "shard_drr",
    "make_sharded_render",
    "slab_sharded_raycast",
    "slab_sharded_joseph",
    "slab_sharded_siddon",
    "make_reconstruction_step",
    "initialize_distributed",
    "global_mesh",
    "local_batch_to_global",
    "process_local_slice",
]
