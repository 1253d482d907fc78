"""Pendulum and double-integrator plants.

These are the short-horizon MLP-denoiser workloads named in the benchmark
config list (BASELINE.json configs[1]); the reference itself only ships
cart-pole / acrobot / Panda, so these follow the standard textbook models with
the same Euler-forward integration style as the reference's cart-pole
(`nmpc_multi_process_collect_data.py:121-137`).
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Plant, QuadraticCost
from ..utils.precision import hmatmul

__all__ = ["pendulum", "pendulum_cost", "double_integrator", "double_integrator_cost"]


def pendulum(dt: float = 0.01, m: float = 1.0, l: float = 1.0, g: float = 9.81, b: float = 0.05) -> Plant:
    """Torque-actuated pendulum, state (theta, theta_dot), theta=0 upright."""

    def step(x, u):
        uu = jnp.reshape(u, (-1,))[0]
        theta_ddot = (g / l) * jnp.sin(x[0]) - (b / (m * l * l)) * x[1] + uu / (m * l * l)
        xdot = jnp.stack([x[1], theta_ddot])
        return x + xdot * dt

    return Plant(name="pendulum", state_dim=2, control_dim=1, dt=dt, step=step)


def pendulum_cost() -> QuadraticCost:
    return QuadraticCost(
        q_diag=jnp.array([10.0, 0.1], dtype=jnp.float32),
        r=jnp.float32(0.01),
        p_diag=jnp.array([100.0, 1.0], dtype=jnp.float32),
    )


def double_integrator(dt: float = 0.05) -> Plant:
    """1-D double integrator, state (pos, vel), exact discretization."""
    a_d = jnp.array([[1.0, dt], [0.0, 1.0]], dtype=jnp.float32)
    b_d = jnp.array([[0.5 * dt * dt], [dt]], dtype=jnp.float32)

    def step(x, u):
        return hmatmul(a_d, x) + hmatmul(b_d, jnp.reshape(u, (1,)))

    return Plant(name="double_integrator", state_dim=2, control_dim=1, dt=dt, step=step)


def double_integrator_cost() -> QuadraticCost:
    return QuadraticCost(
        q_diag=jnp.array([1.0, 0.1], dtype=jnp.float32),
        r=jnp.float32(0.1),
        p_diag=jnp.array([10.0, 1.0], dtype=jnp.float32),
    )
