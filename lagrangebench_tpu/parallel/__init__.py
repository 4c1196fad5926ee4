"""Device-mesh parallelism helpers."""

from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    init_distributed,
    make_mesh,
    make_mesh_2d,
    replicate_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "init_distributed",
]
