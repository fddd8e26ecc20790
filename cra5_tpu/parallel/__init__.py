from .mesh import make_mesh, local_device_count
from .sharding import (
    batch_sharding,
    replicate,
    vaeformer_param_specs,
    shard_variables,
)

__all__ = [
    "make_mesh",
    "local_device_count",
    "batch_sharding",
    "replicate",
    "vaeformer_param_specs",
    "shard_variables",
]
