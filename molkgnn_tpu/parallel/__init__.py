from molkgnn_tpu.parallel.data_parallel import (
    make_mesh,
    shard_train_step,
    stack_shards,
)
from molkgnn_tpu.parallel.halo import (
    halo_parallel_forward,
    halo_stats,
    halo_train_step,
    partition_halo,
)
from molkgnn_tpu.parallel.hybrid import (
    hybrid_parallel_forward,
    hybrid_train_step,
    make_mesh_2d,
    partition_hybrid,
)

__all__ = [
    "make_mesh",
    "shard_train_step",
    "stack_shards",
    "partition_halo",
    "halo_stats",
    "halo_parallel_forward",
    "halo_train_step",
    "make_mesh_2d",
    "partition_hybrid",
    "hybrid_parallel_forward",
    "hybrid_train_step",
]
