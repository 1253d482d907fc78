from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_dp_train_step,
    make_sharded_eval,
)
