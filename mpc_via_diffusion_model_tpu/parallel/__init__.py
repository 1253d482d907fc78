from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_dp_train_step,
    make_sharded_eval,
)
from .tensor_parallel import make_tp_ampc_apply
from .tp_unet import make_tp_unet_apply
