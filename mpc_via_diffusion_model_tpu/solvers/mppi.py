"""MPPI (Model-Predictive Path Integral) sampling-based OCP solver.

A TPU-native addition beyond the reference's IPOPT/acados experts: where
gradient-based solvers (iLQR) find local optima, MPPI explores with
thousands of perturbed rollouts evaluated in parallel — exactly the workload
TPUs are built for (the `vmap`ped rollout batch maps onto the vector units
with zero branching). Used for expert-data diversity (escaping the flat
basins of the swing-up cost, cf. tests/test_solvers) and as a baseline
controller.

Standard MPPI update (Williams et al.): sample N noise sequences eps_i ~
N(0, sigma^2), roll out u + eps_i, weight by softmax(-cost/temperature),
update u <- u + sum_i w_i eps_i; iterate.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..dynamics.base import Plant, QuadraticCost

__all__ = ["MPPIConfig", "mppi_solve", "mppi_solve_batched"]


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    horizon: int
    n_samples: int = 1024
    n_iterations: int = 8
    temperature: float = 1.0
    # scalar, or a per-control-channel tuple (essential when channels have
    # wildly different scales — e.g. quadrotor thrust ~10 N vs torques on
    # inertias of 0.01 kg m^2, where scalar noise blows up every rollout)
    noise_sigma: float | Tuple[float, ...] = 5.0
    noise_decay: float = 0.7  # sigma shrinks per iteration (CEM-flavored)


def _rollout_cost(plant: Plant, cost: QuadraticCost, x0, us):
    def body(carry, u):
        x, acc = carry
        acc = acc + cost.stage(x, u)
        return (plant.step(x, u), acc), None

    (x_f, acc), _ = jax.lax.scan(body, (x0, jnp.float32(0.0)), us)
    return acc + cost.terminal(x_f)


def mppi_solve(
    plant: Plant,
    cost: QuadraticCost,
    x0: jnp.ndarray,
    u_init: jnp.ndarray,
    config: MPPIConfig,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (us (H, m), final expected cost)."""
    m = plant.control_dim
    batched_cost = jax.vmap(lambda us: _rollout_cost(plant, cost, x0, us))

    def iteration(carry, k):
        u, sigma = carry
        eps = jax.random.normal(k, (config.n_samples, config.horizon, m)) * sigma
        costs = batched_cost(u[None] + eps)
        # Mask diverged rollouts to a LARGE FINITE cost, not inf: if every
        # rollout diverges (stiff plants under wide exploration noise),
        # inf - inf = nan would poison the softmax and u forever; with a
        # finite ceiling the all-bad case degrades to uniform weights
        # (u <- u + mean eps ~= u) and the solve stays finite.
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))
        beta = jnp.min(costs)
        w = jax.nn.softmax(-(costs - beta) / config.temperature)
        u_new = u + jnp.einsum("n,nhm->hm", w, eps)
        return (u_new, sigma * config.noise_decay), None

    sigma0 = jnp.broadcast_to(jnp.asarray(config.noise_sigma, jnp.float32), (m,))
    keys = jax.random.split(key, config.n_iterations)
    (u, _), _ = jax.lax.scan(iteration, (u_init, sigma0), keys)
    return u, _rollout_cost(plant, cost, x0, u)


def mppi_solve_batched(
    plant: Plant,
    cost: QuadraticCost,
    x0_batch: jnp.ndarray,
    u_init_batch: jnp.ndarray,
    config: MPPIConfig,
    key: jax.Array,
):
    """vmap over initial states (independent noise per state)."""
    keys = jax.random.split(key, x0_batch.shape[0])
    return jax.vmap(lambda x0, ui, k: mppi_solve(plant, cost, x0, ui, config, k))(
        x0_batch, u_init_batch, keys
    )
