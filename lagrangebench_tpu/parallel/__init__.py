"""Device-mesh parallelism helpers."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    init_distributed,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "init_distributed",
]
