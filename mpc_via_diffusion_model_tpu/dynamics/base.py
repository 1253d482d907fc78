"""Plant and cost abstractions: pure-function dynamics for jit/vmap/scan.

TPU-native replacement for the reference's scattered CasADi/numpy dynamics
(`scripts/inference/Cart_Diffusion_inference.py:107-200`,
`scripts/inference/Diffusion_MPC_Inference.py:39-84`). Each plant is a frozen
dataclass whose ``step`` is a pure ``(x, u) -> x_next`` function with the
integration timestep baked in at construction, so the whole closed loop
compiles into one XLA program:

- no re-discretization per call (the reference rebuilds the ZoH discretization
  with `control.c2d` inside every dynamics evaluation,
  `Diffusion_MPC_Inference.py:54-70`),
- `vmap` over initial states replaces `multiprocessing.Pool(30)`
  (`nmpc_multi_process_collect_data.py:363`),
- rollouts are `lax.scan`s, differentiable end-to-end, which gives
  cost-gradient guidance for free (replaces the hand-written numpy gradient in
  `mpd/models/diffusion_models/guides.py:371-422`).

State stays fp32: Euler at dt=0.01 over ~100 steps accumulates error in bf16.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["Plant", "QuadraticCost", "rollout", "rollout_with_cost", "reference_mpc_cost"]

StepFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Plant:
    """A discrete-time plant: ``x_{k+1} = step(x_k, u_k)``.

    ``step`` takes ``x`` of shape (state_dim,) and ``u`` of shape
    (control_dim,) and returns the next state; it must be pure jnp so that it
    is freely jit/vmap/grad-able.
    """

    name: str
    state_dim: int
    control_dim: int
    dt: float
    step: StepFn

    def batched_step(self) -> StepFn:
        """vmap the step over a leading batch axis on both x and u."""
        return jax.vmap(self.step)


@dataclasses.dataclass(frozen=True)
class QuadraticCost:
    """Quadratic tracking cost to the origin: stage ``x'Qx + u'Ru``,
    terminal ``x'Px`` (diagonal Q/P, scalar-or-diagonal R), matching the cost
    structure of every reference OCP (`Cart_Diffusion_inference.py:36-46`,
    `Diffusion_MPC_Inference.py:313-316`).
    """

    q_diag: jnp.ndarray  # (state_dim,)
    r: jnp.ndarray  # scalar or (control_dim,)
    p_diag: jnp.ndarray  # (state_dim,)

    def stage(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(self.q_diag * jnp.square(x)) + jnp.sum(self.r * jnp.square(u))

    def terminal(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(self.p_diag * jnp.square(x))


def rollout(plant: Plant, x0: jnp.ndarray, u_seq: jnp.ndarray,
            unroll: int = 1) -> jnp.ndarray:
    """Roll the plant through a control sequence.

    Args:
      x0: (state_dim,) initial state.
      u_seq: (horizon, control_dim) controls.
      unroll: lax.scan unroll factor. The rollout is inherently sequential
        tiny-op work; differentiating through it (cost-gradient guides) runs
        a second sequential scan backward. Full unroll lets XLA fuse the
        whole chain: measured 12.6 -> 22.6 Hz (1.8x) on the guided quadrotor
        closed loop (BENCH.md), which stays op-latency-bound — the serving
        answer to guided speed is distilling the guided teacher
        (scripts/distill_quadrotor.py --guided).

    Returns:
      (horizon + 1, state_dim) state trajectory including ``x0``.
    """

    def body(x, u):
        x_next = plant.step(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, u_seq, unroll=unroll)
    return jnp.concatenate([x0[None], xs], axis=0)


def rollout_with_cost(
    plant: Plant,
    cost: QuadraticCost,
    x0: jnp.ndarray,
    u_seq: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused rollout + quadratic cost accumulation in one scan.

    Cost convention (the standard OCP cost the reference MPC solvers minimize,
    `Cart_Diffusion_inference.py:222-236`): stage cost on x_0..x_{H-1} and all
    controls, terminal cost on x_H.

    Returns (states (H+1, d), total cost scalar).
    """

    def body(carry, u):
        x, acc = carry
        acc = acc + cost.stage(x, u)
        x_next = plant.step(x, u)
        return (x_next, acc), x_next

    (x_final, acc), xs = jax.lax.scan(body, (x0, jnp.float32(0.0)), u_seq)
    total = acc + cost.terminal(x_final)
    return jnp.concatenate([x0[None], xs], axis=0), total


def reference_mpc_cost(
    plant: Plant,
    cost: QuadraticCost,
    x0: jnp.ndarray,
    u_seq: jnp.ndarray,
) -> jnp.ndarray:
    """Bit-exact port of the reference's closed-loop cost metric `calMPCCost`
    (`Cart_Diffusion_inference.py:247-283`), preserved verbatim so our parity
    numbers are computed with the same (quirky) formula:

    - full Q-weighted cost on x0 plus R on u_0,
    - stage terms for i = 1..H-2 skip state dimension 0 and re-add R u_i^2,
    - the final-state term uses x_{H-2}-rolled-one-step (the loop variable
      ``xnext`` after the last stage iteration), not x_H.
    """
    horizon = u_seq.shape[0]
    u_rows = u_seq.reshape(horizon, -1)  # (H, m); the reference is scalar-u
    # (calMPCCost indexes u[i][0][0]); multi-channel controls generalize by
    # summing R over the control vector.

    init_cost = jnp.sum(cost.q_diag * jnp.square(x0)) + jnp.sum(cost.r * jnp.square(u_rows[0]))

    def body(carry, u_next):
        x_cur, u_cur, acc = carry
        x_next = plant.step(x_cur, u_cur)
        acc = acc + jnp.sum(cost.q_diag[1:] * jnp.square(x_next[1:]))
        acc = acc + jnp.sum(cost.r * jnp.square(u_next))
        return (x_next, u_next, acc), None

    # stage loop i = 1 .. H-2 consumes u_1 .. u_{H-2}
    (x_last, _, acc), _ = jax.lax.scan(
        body, (x0, u_rows[0], init_cost), u_rows[1 : horizon - 1]
    )
    return acc + jnp.sum(cost.p_diag * jnp.square(x_last))
