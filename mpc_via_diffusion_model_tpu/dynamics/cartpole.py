"""Cart-pole plant family.

Three variants, matching the three workloads of the reference:

1. :func:`cartpole_lmpc` — 4-state linear cart-pole, ZoH-discretized at
   Ts=0.1 (reference `scripts/inference/Diffusion_MPC_Inference.py:39-84`).
   The reference rebuilds the ZoH discretization with `control.c2d` on every
   dynamics call; here ``A_d = expm([[A, B], [0, 0]] dt)`` is computed once at
   construction and the step is a single matmul.

2. :func:`cartpole_virtual_swingup` — 5-state nonlinear swing-up cart-pole
   with the redundant "virtual" angle state theta* = -(theta-pi)^2/pi + pi
   (reference `scripts/mpc_data_collecting/nmpc_multi_process_collect_data.py:
   83-137`, Euler forward at Ts=0.01). This is the multi-modal workload: from
   theta ~ pi the expert can swing up left or right.

3. :func:`cartpole_virtual_stabilized` — the alternative 5-state model of
   `scripts/inference/Cart_Diffusion_inference.py:122-197` (``xdot_new``
   branch): linear spring/damper pendulum-on-cart constants (M_car=4.5 kg,
   m_pole=0.12 kg, ...) with the same virtual state.

All steps are pure jnp and Euler/ZoH-exact to the reference within fp32.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Plant, QuadraticCost
from ..utils.precision import hmatmul

__all__ = [
    "theta_to_red_theta",
    "cartpole_lmpc",
    "cartpole_lmpc_cost",
    "cartpole_virtual_swingup",
    "cartpole_virtual_stabilized",
    "cartpole_virtual_cost",
    "cartpole_virtual_collect_cost",
]

# ---------------------------------------------------------------------------
# Virtual (redundant) angle state
# ---------------------------------------------------------------------------


def theta_to_red_theta(theta):
    """theta* = (theta - pi)^2 / (-pi) + pi (reference
    `Cart_Diffusion_inference.py:199-200`). Maps both swing-up directions
    (theta -> 0 and theta -> 2pi) to the same target theta* -> 0."""
    return (theta - jnp.pi) ** 2 / (-jnp.pi) + jnp.pi


# ---------------------------------------------------------------------------
# 1) Linear 4-state cart-pole, ZoH at Ts = 0.1
# ---------------------------------------------------------------------------

_LMPC_A = np.array(
    [
        [0.0, 1.0, 0.0, 0.0],
        [0.0, -0.1, 3.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [0.0, -0.5, 30.0, 0.0],
    ]
)
_LMPC_B = np.array([[0.0], [2.0], [0.0], [5.0]])


def _zoh_discretize(a: np.ndarray, b: np.ndarray, dt: float):
    """Exact zero-order-hold discretization via the augmented matrix
    exponential: expm([[A, B], [0, 0]] dt) = [[A_d, B_d], [0, I]].

    Replaces `control.c2d(..., method='zoh')` (which the reference calls on
    every plant step, `Diffusion_MPC_Inference.py:59-70`) with a one-time
    host-side computation.
    """
    n, m = a.shape[0], b.shape[1]
    aug = np.zeros((n + m, n + m))
    aug[:n, :n] = a
    aug[:n, n:] = b
    # scaling-and-squaring series expm in float64; the matrix is tiny (5x5).
    s = max(0, int(np.ceil(np.log2(max(1e-16, np.linalg.norm(aug * dt, ord=1))))) + 1)
    x = aug * dt / (2.0 ** s)
    term = np.eye(n + m)
    out = np.eye(n + m)
    for k in range(1, 20):
        term = term @ x / k
        out = out + term
    for _ in range(s):
        out = out @ out
    return out[:n, :n], out[:n, n:]


def cartpole_lmpc(dt: float = 0.1) -> Plant:
    a_d, b_d = _zoh_discretize(_LMPC_A, _LMPC_B, dt)
    a_d = jnp.asarray(a_d, dtype=jnp.float32)
    b_d = jnp.asarray(b_d, dtype=jnp.float32)

    def step(x, u):
        return hmatmul(a_d, x) + hmatmul(b_d, jnp.reshape(u, (1,)))

    return Plant(name="cartpole_lmpc", state_dim=4, control_dim=1, dt=dt, step=step)


def cartpole_lmpc_cost() -> QuadraticCost:
    """Q=diag(10,1,10,1), R=1, P=diag(100,1,100,1)
    (reference `Diffusion_MPC_Inference.py:313-316`)."""
    return QuadraticCost(
        q_diag=jnp.array([10.0, 1.0, 10.0, 1.0], dtype=jnp.float32),
        r=jnp.float32(1.0),
        p_diag=jnp.array([100.0, 1.0, 100.0, 1.0], dtype=jnp.float32),
    )


# ---------------------------------------------------------------------------
# 2) Nonlinear 5-state swing-up cart-pole (data-collection / NMPC workload)
# ---------------------------------------------------------------------------

_M_CART = 2.0
_M_POLE = 1.0
_M_TOTAL = _M_CART + _M_POLE
_L_POLE = 1.0
_MPLP = _M_POLE * _L_POLE
_G = 9.81
_MPG = _M_POLE * _G
_MTG = _M_TOTAL * _G
_MTLP = _M_TOTAL * _G  # sic: the reference sets MTLP = M_TOTAL * G (`nmpc_multi_process_collect_data.py:91`)
_PI_UNDER_2 = 2.0 / np.pi


def cartpole_virtual_swingup(dt: float = 0.01) -> Plant:
    def step(x, u):
        uu = jnp.reshape(u, (-1,))[0]
        sin_t = jnp.sin(x[2])
        cos_t = jnp.cos(x[2])
        xdot = jnp.stack(
            [
                x[1],
                (_MPLP * -sin_t * x[3] ** 2 + _MPG * sin_t * cos_t + uu)
                / (_M_TOTAL - _M_POLE * cos_t) ** 2,
                x[3],
                (-_MPLP * sin_t * cos_t * x[3] ** 2 - _MTG * sin_t - cos_t * uu)
                / (_MTLP - _MPLP * cos_t ** 2),
                -_PI_UNDER_2 * (x[2] - jnp.pi) * x[3],
            ]
        )
        return x + xdot * dt

    return Plant(name="cartpole_virtual_swingup", state_dim=5, control_dim=1, dt=dt, step=step)


# ---------------------------------------------------------------------------
# 3) Alternative 5-state model (Cart_Diffusion_inference "xdot_new")
# ---------------------------------------------------------------------------

_M_CAR2 = 4.5
_M_POLE2 = 0.12
_L_PEND = 0.14
_K_SPRING = 0.5
_C_DAMP = 0.002
_I_POLE = (_M_POLE2 * _L_PEND ** 2) / 3.0
_V1 = (_M_CAR2 + _M_POLE2) / (_I_POLE * (_M_CAR2 + _M_POLE2) + (_L_PEND ** 2) * _M_POLE2 * _M_CAR2)
_V2 = (_I_POLE + (_L_PEND ** 2) * _M_POLE2) / (
    _I_POLE * (_M_CAR2 + _M_POLE2) + (_L_PEND ** 2) * _M_POLE2 * _M_CAR2
)


def cartpole_virtual_stabilized(dt: float = 0.01) -> Plant:
    def step(x, u):
        uu = jnp.reshape(u, (-1,))[0]
        xddot = (
            -_K_SPRING * _V2 * x[1]
            + ((_L_PEND * _M_POLE2) ** 2) * _G * _V2 / (_I_POLE + (_L_PEND ** 2) * _M_POLE2) * x[2]
            - _L_PEND * _M_POLE2 * _C_DAMP * _V2 / (_I_POLE + (_L_PEND ** 2) * _M_POLE2) * x[3]
            + _V2 * uu
        )
        tddot = (
            -_L_PEND * _M_POLE2 * _K_SPRING * _V1 / (_M_CAR2 + _M_POLE2) * x[1]
            + _L_PEND * _M_POLE2 * _G * _V1 * x[2]
            - _C_DAMP * _V1 * x[3]
            + _L_PEND * _M_POLE2 * _V1 / (_M_CAR2 + _M_POLE2) * uu
        )
        xdot = jnp.stack([x[1], xddot, x[3], tddot, -_PI_UNDER_2 * (x[2] - jnp.pi) * x[3]])
        return x + xdot * dt

    return Plant(name="cartpole_virtual_stabilized", state_dim=5, control_dim=1, dt=dt, step=step)


def cartpole_virtual_cost(q_redundant: float = 1000.0, p_redundant: float = 1000.0) -> QuadraticCost:
    """Q=diag(0.01,0.01,0,0.001,1000), R=0.1, P likewise — the reference's
    INFERENCE/evaluation cost (`Cart_Diffusion_inference.py:36-46`)."""
    return QuadraticCost(
        q_diag=jnp.array([0.01, 0.01, 0.0, 0.001, q_redundant], dtype=jnp.float32),
        r=jnp.float32(0.1),
        p_diag=jnp.array([0.01, 0.01, 0.0, 0.001, p_redundant], dtype=jnp.float32),
    )


def cartpole_virtual_collect_cost() -> QuadraticCost:
    """The reference's DATA-COLLECTION cost — Q=diag(0.01,0.01,0,0.01,1000),
    R=0.001, P=diag(0.01,0.1,0,0.1,1000)
    (`nmpc_multi_process_collect_data.py:61-65`). The 100x-cheaper control
    penalty is what makes the +/- initial-guess solutions at the theta=pi
    saddle LARGE and well-separated — the source of the one-state
    multi-modality the SAMPLING_TIMES study measures; collecting with the
    inference cost (R=0.1) shrinks the two modes to ~+-0.1 and the trained
    sampler averages them away."""
    return QuadraticCost(
        q_diag=jnp.array([0.01, 0.01, 0.0, 0.01, 1000.0], dtype=jnp.float32),
        r=jnp.float32(0.001),
        p_diag=jnp.array([0.01, 0.1, 0.0, 0.1, 1000.0], dtype=jnp.float32),
    )
