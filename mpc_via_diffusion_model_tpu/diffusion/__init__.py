from .gaussian_diffusion import GaussianDiffusion, HardConds, apply_hard_conds
from .distillation import (
    ddim_time_grid,
    halve_times,
    ddim_affine_coefs,
    make_distill_step,
    make_student_ddim_sampler,
)
from .guides import (
    make_guide,
    collision_avoidance_guide,
    config_collision_avoidance_guide,
    smoothness_finite_difference_guide,
    gp_prior_guide,
    state_goal_guide,
    first_order_smoothness_guide,
    last_point_guide,
    multi_sphere_obstacle_guide,
    se3_orientation_goal_guide,
    control_effort_guide,
    stochgpmp_guide,
)
