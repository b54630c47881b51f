from chore_tpu.parallel.mesh import (
    data_sharding,
    init_distributed,
    is_main_process,
    local_batch_slice,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "data_sharding",
    "init_distributed",
    "is_main_process",
    "local_batch_slice",
    "make_mesh",
    "replicate",
    "shard_batch",
]
