"""Finite-horizon LQR via backward Riccati recursion (jit/vmap-able).

Replaces CasADi+IPOPT for the reference's LINEAR MPC problems: the LMPC OCP
(`scripts/inference/Diffusion_MPC_Inference.py:345-372`) has only dynamics
equality constraints and a quadratic objective, so the Riccati solution IS the
global optimum — what IPOPT converges to, computed in one scan instead of an
interior-point iteration, and vmappable over thousands of initial states
(replacing the data-collection grids of `cart_pole_lmpc_collecting.py`).

Cost convention matched to the reference OCP (`Diffusion_MPC_Inference.py:
352-368`): J = sum_{k=0}^{N-1} (x_k'Q x_k + u_k'R u_k) + x_N'P x_N. The
reference adds a constant x_0'Q x_0 term and starts stage costs at k=1 — the
same objective up to a constant, so the argmin is identical.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.precision import hmatmul

__all__ = ["LQRSolution", "lqr_gains", "lqr_solve", "lqr_solve_batched"]


@dataclasses.dataclass(frozen=True)
class LQRSolution:
    us: jnp.ndarray  # (H, m)
    xs: jnp.ndarray  # (H+1, n)
    cost: jnp.ndarray  # scalar


jax.tree_util.register_pytree_node(
    LQRSolution,
    lambda s: ((s.us, s.xs, s.cost), None),
    lambda _, leaves: LQRSolution(*leaves),
)


def lqr_gains(
    a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray, r: jnp.ndarray, p: jnp.ndarray, horizon: int
) -> jnp.ndarray:
    """Backward Riccati recursion; returns time-varying feedback gains K
    (H, m, n) with u_k = -K_k x_k."""

    def body(v, _):
        btv = hmatmul(b.T, v)
        k_gain = jnp.linalg.solve(r + hmatmul(btv, b), hmatmul(btv, a))
        a_cl = a - hmatmul(b, k_gain)
        v_new = q + hmatmul(k_gain.T, hmatmul(r, k_gain)) + hmatmul(a_cl.T, hmatmul(v, a_cl))
        v_new = 0.5 * (v_new + v_new.T)
        return v_new, k_gain

    _, ks_rev = jax.lax.scan(body, p, None, length=horizon)
    return ks_rev[::-1]


def lqr_solve(
    a: jnp.ndarray,
    b: jnp.ndarray,
    q: jnp.ndarray,
    r: jnp.ndarray,
    p: jnp.ndarray,
    x0: jnp.ndarray,
    horizon: int,
    gains: jnp.ndarray = None,
) -> LQRSolution:
    """Solve the finite-horizon LQR OCP from ``x0``; returns the open-loop
    optimal control sequence, state trajectory, and cost. Pass precomputed
    ``gains`` (from `lqr_gains`) to skip the state-independent Riccati
    recursion in receding-horizon loops."""
    ks = gains if gains is not None else lqr_gains(a, b, q, r, p, horizon)

    def body(x, k_gain):
        u = -hmatmul(k_gain, x)
        stage = hmatmul(x, hmatmul(q, x)) + hmatmul(u, hmatmul(r, u))
        x_next = hmatmul(a, x) + hmatmul(b, u)
        return x_next, (u, x_next, stage)

    x_final, (us, xs, stages) = jax.lax.scan(body, x0, ks)
    cost = jnp.sum(stages) + hmatmul(x_final, hmatmul(p, x_final))
    return LQRSolution(us=us, xs=jnp.concatenate([x0[None], xs], axis=0), cost=cost)


def lqr_solve_batched(a, b, q, r, p, x0_batch: jnp.ndarray, horizon: int) -> LQRSolution:
    """vmap over a batch of initial states (gains computed once, shared)."""
    return jax.vmap(lambda x0: lqr_solve(a, b, q, r, p, x0, horizon))(x0_batch)
