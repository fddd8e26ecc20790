from .mesh import make_mesh, local_device_count
from .sharding import (
    batch_sharding,
    mesh_param_specs,
    replicate,
    vaeformer_param_specs,
    shard_variables,
)
from .distributed import (
    barrier,
    kv_barrier,
    fetch_tree,
    init_distributed,
    is_primary,
    local_work_slice,
    make_global_batch,
    process_count,
    process_index,
    put_tree,
)

__all__ = [
    "make_mesh",
    "local_device_count",
    "batch_sharding",
    "mesh_param_specs",
    "replicate",
    "vaeformer_param_specs",
    "shard_variables",
    "barrier",
    "kv_barrier",
    "fetch_tree",
    "init_distributed",
    "is_primary",
    "local_work_slice",
    "make_global_batch",
    "process_count",
    "process_index",
    "put_tree",
]
