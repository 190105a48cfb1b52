from .mesh import (
    batch_sharding,
    make_mesh,
    parse_mesh,
    replicated,
    shard_batch,
    with_width_sharding,
)

__all__ = [
    "make_mesh",
    "parse_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "with_width_sharding",
]
