from fairdiff.parallel.tp import shard_sd_params, sd_param_specs
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
    "shard_sd_params",
    "sd_param_specs",
]
