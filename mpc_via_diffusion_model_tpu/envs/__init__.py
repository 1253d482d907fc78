from .planning2d import PlanningEnv2D, make_random_env, ENV_SIMPLE_2D, smooth_distance_penalty, interpolate_points
from .planning3d import (
    PlanningEnv3D, PandaArmEnv3D, ENV_SPHERES_3D, PANDA_Q_MIN, PANDA_Q_MAX,
    PANDA_COLLISION_SPHERES, make_panda_arm_env,
)
