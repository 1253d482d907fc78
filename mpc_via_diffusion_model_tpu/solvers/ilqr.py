"""Batched iLQR: the in-framework nonlinear-OCP expert.

Replaces CasADi+IPOPT (`Cart_Diffusion_inference.py:202-244` `MPC_Solve`) and
acados (`Acrobots/acrobots_nmpc.py:148-180`) for data generation and the
online NMPC baseline. The reference's OCPs have quadratic objectives and
dynamics equality constraints only (no input/state bounds), which iLQR solves
to the same stationary points; the two-basin swing-up trick
(`Cart_Diffusion_inference.py:49-51`: IPOPT initial guesses x=+/-10,
u=+/-1000) maps to iLQR's initial control sequence sign.

Everything is jit-compiled with static iteration counts:
- linearization: `jax.jacobian` over the rollout (vmapped over time),
- backward pass: one `lax.scan` Riccati-like recursion with Levenberg
  regularization,
- forward pass: a fixed line-search grid evaluated with `vmap` (all
  candidates rolled out in parallel — TPU-friendly, no data-dependent
  branching),
- `vmap` over (initial states x guesses) replaces `multiprocessing.Pool(30)`
  (`nmpc_multi_process_collect_data.py:334-364`).

Precision note: solves run in fp32 (TPU-native); on ill-conditioned problems
(e.g. the stiff LMPC cart-pole with P=diag(100,..)) the converged controls
carry ~1e-3 relative error vs an fp64 interior-point solve — well below the
imitation error of the trained diffusion model (BASELINE.md parity ~3e-3 per
step).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..dynamics.base import Plant, QuadraticCost
from ..utils.precision import hmatmul

__all__ = ["ILQRConfig", "ILQRSolution", "ilqr_solve", "ilqr_solve_batched", "pd_solve"]


def pd_solve(mat: jnp.ndarray, rhs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve ``mat @ x = rhs`` for symmetric ``mat`` via Cholesky, returning
    ``(x, ok)`` where ``ok`` is True iff ``mat`` is positive definite (every
    Cholesky pivot succeeded). An indefinite matrix with positive diagonal is
    correctly rejected — the failure mode a diagonal-sign proxy misses for
    m > 1. On failure x is zeroed so downstream recursions stay finite."""
    chol = jnp.linalg.cholesky(mat)
    ok = jnp.all(jnp.isfinite(chol))
    sol = jax.scipy.linalg.cho_solve((chol, True), rhs)
    return jnp.where(ok, sol, jnp.zeros_like(sol)), ok


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    horizon: int
    n_iterations: int = 50
    line_search_alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    reg_init: float = 1e-6
    reg_increase: float = 10.0
    reg_decrease: float = 2.0
    reg_min: float = 1e-8
    reg_max: float = 1e8


@dataclasses.dataclass(frozen=True)
class ILQRSolution:
    us: jnp.ndarray  # (H, m)
    xs: jnp.ndarray  # (H+1, n)
    cost: jnp.ndarray  # scalar
    improved_last_iter: jnp.ndarray  # bool diagnostic
    backward_ok: jnp.ndarray  # bool: last backward pass had all Quu_reg PD (Cholesky)


jax.tree_util.register_pytree_node(
    ILQRSolution,
    lambda s: ((s.us, s.xs, s.cost, s.improved_last_iter, s.backward_ok), None),
    lambda _, leaves: ILQRSolution(*leaves),
)


def _total_cost(plant: Plant, cost: QuadraticCost, x0, us):
    def body(carry, u):
        x, acc = carry
        acc = acc + cost.stage(x, u)
        x = plant.step(x, u)
        return (x, acc), x

    (x_f, acc), xs = jax.lax.scan(body, (x0, jnp.float32(0.0)), us)
    return acc + cost.terminal(x_f), jnp.concatenate([x0[None], xs], axis=0)


def ilqr_backward(plant: Plant, cost: QuadraticCost, xs, us, reg):
    """LQ-approximation backward pass.

    Returns (k (H, m), K (H, m, n), ok) with the feedforward/feedback terms of
    delta-u* = k + K delta-x, and ok = all regularized Quu were PD.
    """
    m = plant.control_dim
    q_mat = jnp.diag(cost.q_diag)
    r_diag = jnp.broadcast_to(jnp.atleast_1d(cost.r), (m,))
    r_mat = jnp.diag(r_diag)
    p_mat = jnp.diag(cost.p_diag)

    fx = jax.vmap(jax.jacobian(plant.step, argnums=0))(xs[:-1], us)
    fu = jax.vmap(jax.jacobian(plant.step, argnums=1))(xs[:-1], us)
    cx = 2.0 * cost.q_diag * xs[:-1]
    cu = 2.0 * r_diag * us

    vx_f = 2.0 * cost.p_diag * xs[-1]
    vxx_f = 2.0 * p_mat

    def bw_body(carry, inp):
        vx, vxx, ok = carry
        fx_t, fu_t, cx_t, cu_t = inp
        qx = cx_t + hmatmul(fx_t.T, vx)
        qu = cu_t + hmatmul(fu_t.T, vx)
        qxx = 2.0 * q_mat + hmatmul(fx_t.T, hmatmul(vxx, fx_t))
        quu = 2.0 * r_mat + hmatmul(fu_t.T, hmatmul(vxx, fu_t))
        qux = hmatmul(fu_t.T, hmatmul(vxx, fx_t))

        quu_reg = quu + reg * jnp.eye(m)
        sol, ok_t = pd_solve(quu_reg, jnp.concatenate([qu[:, None], qux], axis=1))
        k_t = -sol[:, 0]
        k_gain_t = -sol[:, 1:]

        vx_new = qx + hmatmul(k_gain_t.T, hmatmul(quu, k_t)) + hmatmul(k_gain_t.T, qu) + hmatmul(qux.T, k_t)
        vxx_new = qxx + hmatmul(k_gain_t.T, hmatmul(quu, k_gain_t)) + hmatmul(k_gain_t.T, qux) + hmatmul(qux.T, k_gain_t)
        vxx_new = 0.5 * (vxx_new + vxx_new.T)
        return (vx_new, vxx_new, jnp.logical_and(ok, ok_t)), (k_t, k_gain_t)

    (_, _, ok), (ks_rev, kgains_rev) = jax.lax.scan(
        bw_body,
        (vx_f, vxx_f, jnp.bool_(True)),
        (fx[::-1], fu[::-1], cx[::-1], cu[::-1]),
    )
    return ks_rev[::-1], kgains_rev[::-1], ok


def ilqr_forward(plant: Plant, cost: QuadraticCost, x0, xs_ref, us_ref, ks, kgains, alpha):
    """Closed-loop forward rollout with step size alpha; returns
    (us_new (H, m), xs_new (H+1, n), total_cost)."""

    def fw_body(carry, inp):
        x, acc = carry
        x_ref, u_ref, k_t, k_gain_t = inp
        u = u_ref + alpha * k_t + hmatmul(k_gain_t, x - x_ref)
        acc = acc + cost.stage(x, u)
        x_next = plant.step(x, u)
        return (x_next, acc), (u, x_next)

    (x_f, acc), (us_new, xs_new) = jax.lax.scan(
        fw_body, (x0, jnp.float32(0.0)), (xs_ref[:-1], us_ref, ks, kgains)
    )
    total = acc + cost.terminal(x_f)
    return us_new, jnp.concatenate([x0[None], xs_new], axis=0), total


def ilqr_solve(plant: Plant, cost: QuadraticCost, x0: jnp.ndarray, u_init: jnp.ndarray, config: ILQRConfig) -> ILQRSolution:
    """Solve min_u sum stage(x,u) + terminal(x_H) s.t. the plant dynamics,
    starting from control sequence ``u_init`` (H, m)."""
    alphas = jnp.asarray(config.line_search_alphas, dtype=jnp.float32)

    def iteration(carry, _):
        us, xs, j_cur, reg, _ = carry
        ks, kgains, ok = ilqr_backward(plant, cost, xs, us, reg)

        us_cand, xs_cand, j_cand = jax.vmap(
            lambda a: ilqr_forward(plant, cost, x0, xs, us, ks, kgains, a)
        )(alphas)
        j_cand = jnp.where(jnp.isfinite(j_cand), j_cand, jnp.inf)
        best = jnp.argmin(j_cand)
        j_best = j_cand[best]

        improved = jnp.logical_and(ok, j_best < j_cur)
        us_new = jnp.where(improved, us_cand[best], us)
        xs_new = jnp.where(improved, xs_cand[best], xs)
        j_new = jnp.where(improved, j_best, j_cur)
        reg_new = jnp.where(
            improved,
            jnp.maximum(reg / config.reg_decrease, config.reg_min),
            jnp.minimum(reg * config.reg_increase, config.reg_max),
        )
        return (us_new, xs_new, j_new, reg_new, ok), improved

    j0, xs0 = _total_cost(plant, cost, x0, u_init)
    init = (u_init, xs0, j0, jnp.float32(config.reg_init), jnp.bool_(True))
    (us, xs, j_final, _, bw_ok), improved_hist = jax.lax.scan(
        iteration, init, None, length=config.n_iterations
    )
    return ILQRSolution(
        us=us, xs=xs, cost=j_final, improved_last_iter=improved_hist[-1], backward_ok=bw_ok
    )


def ilqr_solve_batched(
    plant: Plant, cost: QuadraticCost, x0_batch: jnp.ndarray, u_init_batch: jnp.ndarray, config: ILQRConfig
) -> ILQRSolution:
    """vmap over (batch of x0, batch of initial guesses). Shapes:
    x0_batch (B, n), u_init_batch (B, H, m)."""
    return jax.vmap(lambda x0, ui: ilqr_solve(plant, cost, x0, ui, config))(x0_batch, u_init_batch)
