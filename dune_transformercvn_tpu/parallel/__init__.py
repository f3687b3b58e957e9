from .mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    local_batch_rows,
    local_shard_ids,
    replicated_sharding,
    shard_ids_of,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "create_mesh",
    "local_batch_rows",
    "local_shard_ids",
    "replicated_sharding",
    "shard_ids_of",
]
