"""Plant zoo: pure-function discrete-time dynamics + quadratic costs."""
from .base import Plant, QuadraticCost, rollout, rollout_with_cost, reference_mpc_cost
from .cartpole import (
    cartpole_lmpc,
    cartpole_lmpc_cost,
    cartpole_virtual_swingup,
    cartpole_virtual_stabilized,
    cartpole_virtual_cost,
    cartpole_virtual_collect_cost,
    theta_to_red_theta,
)
from .simple_plants import pendulum, pendulum_cost, double_integrator, double_integrator_cost
from .acrobot import acrobot, acrobot_cost, theta1_to_star, theta2_to_star
from .quadrotor import (
    quadrotor, quadrotor_cost, obstacle_cost, obstacle_cost_single,
)
from .arm import (
    PANDA_READY_POSE,
    make_panda_context,
    panda_context,
    panda_cost,
    panda_ee_velocity,
    panda_fk,
    panda_inverse_dynamics,
    panda_inverse_dynamics_unrolled,
    panda_link_transforms,
    panda_mass_matrix,
    panda_rbd,
    panda_rbd_unrolled,
    panda_surrogate,
)

PLANTS = {
    "cartpole_lmpc": (cartpole_lmpc, cartpole_lmpc_cost),
    "cartpole_virtual_swingup": (cartpole_virtual_swingup, cartpole_virtual_cost),
    "cartpole_virtual_stabilized": (cartpole_virtual_stabilized, cartpole_virtual_cost),
    "pendulum": (pendulum, pendulum_cost),
    "double_integrator": (double_integrator, double_integrator_cost),
    "acrobot": (acrobot, acrobot_cost),
    "quadrotor": (quadrotor, quadrotor_cost),
    "panda_surrogate": (panda_surrogate, panda_cost),
    "panda": (panda_rbd, panda_cost),
}


def get_plant(name: str, **kwargs):
    """Build (plant, cost) by registry name."""
    if name not in PLANTS:
        raise ValueError(f"unknown plant '{name}'; have {sorted(PLANTS)}")
    plant_fn, cost_fn = PLANTS[name]
    return plant_fn(**kwargs), cost_fn()
