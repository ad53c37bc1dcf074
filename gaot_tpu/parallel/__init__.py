from .mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
    param_specs,
)
from .spatial import (
    enable_spatial_sharding,
    shard_queries,
    spatial_enabled,
    spatial_sharding,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
    "param_specs",
    "enable_spatial_sharding",
    "shard_queries",
    "spatial_enabled",
    "spatial_sharding",
]
