"""Acrobot (2-link underactuated pendulum) with virtual angle states.

Port of the reference's acados model `Acrobot_Acado_model`
(`scripts/mpc_data_collecting/Acrobots/acrobots_nmpc.py:160-236`): 6 states
(theta1, theta2, dtheta1, dtheta2, theta1*, theta2*), torque on the second
joint, manipulator-equation dynamics with cos(theta2)-parameterized mass
matrix, integrated Euler-forward at Ts=0.01 (the acados OCP uses an ERK
integrator; Euler matches the reference's own cart-pole convention and stays
within fp32 tolerance at dt=0.01).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Plant, QuadraticCost

__all__ = ["acrobot", "acrobot_cost", "theta1_to_star", "theta2_to_star"]

_L1 = 1.0  # LINK_LENGTH_1
_M1 = 1.0  # LINK_MASS_1
_M2 = 1.0  # LINK_MASS_2
_LC1 = 0.5  # LINK_COM_POS_1
_LC2 = 0.5  # LINK_COM_POS_2
_MOI = 1.0  # LINK_MOI
_G = 9.81
_PI_UNDER_2 = 2.0 / np.pi


def theta1_to_star(theta1):
    """theta1* = pi - theta1^2/pi (reference `acrobots_nmpc.py:124-125`)."""
    return jnp.pi - (theta1 ** 2) / jnp.pi


def theta2_to_star(theta2):
    """theta2* = (theta2-pi)^2/(-pi) + pi (reference `acrobots_nmpc.py:127-128`)."""
    return (theta2 - jnp.pi) ** 2 / (-jnp.pi) + jnp.pi


def acrobot(dt: float = 0.01) -> Plant:
    def step(x, u):
        uu = jnp.reshape(u, (-1,))[0]
        t1, t2, dt1, dt2 = x[0], x[1], x[2], x[3]
        c2, s2 = jnp.cos(t2), jnp.sin(t2)

        m11 = _MOI + _MOI + _M2 * _L1 ** 2 + 2 * _M2 * _L1 * _LC2 * c2
        m12 = _MOI + _M2 * _L1 * _LC2 * c2
        m22 = _MOI
        det = m11 * m22 - m12 * m12

        c11 = -2 * _M2 * _L1 * _LC2 * s2 * dt2
        c12 = -_M2 * _L1 * _LC2 * s2 * dt2
        c21 = _M2 * _L1 * _LC2 * s2 * dt1

        taug1 = -_M1 * _G * _LC1 * jnp.sin(t1) - _M2 * _G * (
            _L1 * jnp.sin(t1) + _LC2 * jnp.sin(t1 + t2)
        )
        taug2 = -_M2 * _G * _LC2 * jnp.sin(t1 + t2)

        rhs1 = taug1 - (c11 * dt1 + c12 * dt2)
        rhs2 = taug2 + uu - (c21 * dt1)

        dd1 = (m22 * rhs1 - m12 * rhs2) / det
        dd2 = (-m12 * rhs1 + m11 * rhs2) / det

        xdot = jnp.stack(
            [
                dt1,
                dt2,
                dd1,
                dd2,
                -_PI_UNDER_2 * t1 * dt1,
                -_PI_UNDER_2 * (t2 - jnp.pi) * dt2,
            ]
        )
        return x + xdot * dt

    return Plant(name="acrobot", state_dim=6, control_dim=1, dt=dt, step=step)


def acrobot_cost() -> QuadraticCost:
    """Q=diag(0.1,0.1,10,10) on the first four states, R=0.1, terminal
    Q_E=diag(1,1,100,100) (reference `acrobots_nmpc.py:44-48`); virtual states
    unweighted in the shipped config."""
    return QuadraticCost(
        q_diag=jnp.array([0.1, 0.1, 10.0, 10.0, 0.0, 0.0], dtype=jnp.float32),
        r=jnp.float32(0.1),
        p_diag=jnp.array([1.0, 1.0, 100.0, 100.0, 0.0, 0.0], dtype=jnp.float32),
    )
