from chore_tpu.parallel.mesh import (
    data_sharding,
    init_distributed,
    is_main_process,
    local_batch_slice,
    make_mesh,
    process_count,
    process_index,
    replicate,
    shard_batch,
    sync_decision,
)

__all__ = [
    "data_sharding",
    "init_distributed",
    "is_main_process",
    "local_batch_slice",
    "make_mesh",
    "process_count",
    "process_index",
    "replicate",
    "shard_batch",
    "sync_decision",
]
