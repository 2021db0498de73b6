from molkgnn_tpu.parallel.data_parallel import (
    make_mesh,
    shard_train_step,
    stack_shards,
)

__all__ = ["make_mesh", "shard_train_step", "stack_shards"]
