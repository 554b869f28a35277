from fairdiff.parallel.mesh import (
    MeshConfig,
    create_mesh,
    local_slice,
    replicated,
    shard_batch,
    with_sharding,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "local_slice",
    "replicated",
    "shard_batch",
    "with_sharding",
]
