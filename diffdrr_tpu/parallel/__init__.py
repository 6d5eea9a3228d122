"""Multi-chip scaling: device meshes, ray/detector sharding, slab sharding."""

from .sharding import (
    make_mesh,
    shard_drr,
    make_sharded_render,
    slab_sharded_raycast,
    make_reconstruction_step,
)

__all__ = [
    "make_mesh",
    "shard_drr",
    "make_sharded_render",
    "slab_sharded_raycast",
    "make_reconstruction_step",
]
