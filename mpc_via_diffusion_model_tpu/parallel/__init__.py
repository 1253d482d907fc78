from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_dp_train_step,
    make_sharded_eval,
)
from .tensor_parallel import make_tp_ampc_apply
from .tp_unet import (
    make_tp_unet_apply,
    shard_unet_params,
    gather_tp_params,
    weights_to_params,
)
from .tp_train import (
    make_tp_train_state,
    make_tp_train_step,
    tp_state_to_flax,
)
from .pp_chain import make_pp_cfg_sampler
from .sp_unet import make_sp_unet_apply
from .ep_fleet import make_ep_fleet_eval, stack_experts
