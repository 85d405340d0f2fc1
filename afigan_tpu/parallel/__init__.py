from .mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    mesh_from_cfg,
    process_is_main,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "mesh_from_cfg",
    "data_sharding",
    "replicated",
    "replicate",
    "shard_batch",
    "initialize_distributed",
    "process_is_main",
]
