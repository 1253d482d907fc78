from .planning2d import PlanningEnv2D, make_random_env, ENV_SIMPLE_2D, smooth_distance_penalty, interpolate_points
