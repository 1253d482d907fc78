from .precision import HIGHEST, hmatmul
from .misc import (
    to_one_hot,
    from_one_hot,
    batch_jacobian,
    calc_output,
    calc_output_conv2d_transpose,
    fix_random_seed,
    freeze_params,
    dict_to_device,
)
from .data_tools import convert_condition_5_to_4, check_dataset
