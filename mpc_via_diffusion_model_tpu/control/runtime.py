"""Receding-horizon diffusion-MPC runtime: one jitted program, zero host trips.

This is the capability the headline benchmark targets. The reference's control
loop (`scripts/inference/Diffusion_MPC_Inference.py:191-290`) runs on the
host: per control step it (1) reloads the model from disk and re-runs
torch.compile (`:199-227`), (2) normalizes the state on GPU, (3) runs 30
sequential denoise steps with 2 U-Net launches each, (4) copies the control
back to CPU and steps the plant in numpy/casadi (rebuilding the ZoH
discretization, `:54-70`). Here the ENTIRE closed loop — normalize, CFG
sample (lax.scan over denoise steps), unnormalize, plant step, cost
accumulation — is one `lax.scan` inside one jitted function; the model params
are function arguments resident in HBM.

Extensions beyond the reference, all TPU-free-lunch:
- `n_candidates > 1`: vmap thousands of candidate control horizons per replan
  and apply the minimum-cost one (BASELINE.json configs[3]).
- batched closed loops over a grid of initial states (vmap of the whole loop).
- an iLQR-based NMPC closed loop as the cost-parity baseline (replaces the
  per-step CasADi/IPOPT loop, `Cart_Diffusion_inference.py:550-595`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.normalization import NormalizerStats, normalize, unnormalize
from ..diffusion.gaussian_diffusion import GaussianDiffusion
from ..dynamics.base import Plant, QuadraticCost
from ..solvers.ilqr import ILQRConfig, ilqr_solve

__all__ = ["ClosedLoopResult", "make_replan_fn", "make_closed_loop", "make_nmpc_closed_loop", "make_ampc_closed_loop"]


@dataclasses.dataclass(frozen=True)
class ClosedLoopResult:
    """Tracks of one receding-horizon run (mirrors the arrays the reference
    saves as .npy: `Diffusion_MPC_Inference.py:405-430`)."""

    x_track: jnp.ndarray  # (n_steps + 1, state_dim)
    u_track: jnp.ndarray  # (n_steps, control_dim)
    u_horizons: jnp.ndarray  # (n_steps, horizon, control_dim) sampled plans
    stage_costs: jnp.ndarray  # (n_steps,) quadratic stage cost per step


jax.tree_util.register_pytree_node(
    ClosedLoopResult,
    lambda s: ((s.x_track, s.u_track, s.u_horizons, s.stage_costs), None),
    lambda _, leaves: ClosedLoopResult(*leaves),
)


def make_replan_fn(
    diffusion: GaussianDiffusion,
    apply_fn: Callable,
    inputs_stats: NormalizerStats,
    condition_stats: NormalizerStats,
    horizon: int,
    control_dim: int = 1,
    w: float = 0.01,
    n_diffusion_steps_without_noise: int = 5,
    n_candidates: int = 1,
    plant: Optional[Plant] = None,
    cost: Optional[QuadraticCost] = None,
    sampler: str = "ddpm",
    state_to_condition: Optional[Callable] = None,
    sample_override: Optional[Callable] = None,
    guide_builder: Optional[Callable] = None,
    n_guide_steps: int = 1,
    t_start_guide: float = float("inf"),
    selection_horizon: Optional[int] = None,
):
    """Build ``replan(params, x0, key) -> (u_horizon, u_candidates)``.

    ``guide_builder(x0) -> guide`` builds a per-replan cost-gradient guide on
    NORMALIZED u batches (closing over the current plant state); it is passed
    through to `ddpm_cfg_sample` so obstacle/cost guidance composes with CFG
    (the MPD pattern, `inference_(mpd).py:254-298`, applied to control).

    ``sample_override(context_norm, key) -> u_norm (n_candidates, H, du)``
    replaces the diffusion sampler entirely when given (e.g. the
    single-kernel CFG chain, `ops/fused_denoise.make_fused_cfg_chain`).

    ``x0`` is the PLANT state; ``state_to_condition`` (identity by default)
    maps it to the conditioning vector. normalize -> CFG-sample n_candidates
    horizons -> unnormalize -> (optionally) pick the min-rollout-cost
    candidate, with the rollout seeded from the plant state. Matches the
    reference pipeline `Diffusion_MPC_Inference.py:195-258`
    (normalize_condition -> run_CFG -> unnormalize_states -> u[0]).
    """
    if n_candidates > 1:
        assert plant is not None and cost is not None, "candidate selection needs plant+cost"
    if guide_builder is not None and sample_override is not None:
        raise ValueError(
            "guide_builder cannot compose with sample_override — the override "
            "replaces the sampler (guidance must be baked into it)")
    to_cond = state_to_condition or (lambda x: x)

    def replan(params, x0, key):
        cond_norm = normalize(condition_stats, to_cond(x0))[None, :]  # (1, dx)
        ctx = jnp.broadcast_to(cond_norm, (n_candidates, cond_norm.shape[-1]))
        denoise = lambda x, t, c, m: apply_fn(params, x, t, c, m)
        if sample_override is not None:
            u_norm = sample_override(ctx, key)
        elif sampler == "ddpm":
            u_norm = diffusion.ddpm_cfg_sample(
                denoise,
                (n_candidates, horizon, control_dim),
                key,
                ctx,
                w=w,
                n_diffusion_steps_without_noise=n_diffusion_steps_without_noise,
                guide=guide_builder(x0) if guide_builder is not None else None,
                n_guide_steps=n_guide_steps,
                t_start_guide=t_start_guide,
            )
        elif sampler == "ddim":
            # fast mode: T//5 deterministic steps (reference `ddim_sample`,
            # `diffusion_model_base.py:239-314`). w is honored via true
            # CFG-DDIM (doubled-batch x0-recon combination inside
            # ddim_sample); w=0 is the reference's unguided conditional pass.
            # Cost-gradient guidance composes here exactly as in the ddpm
            # branch (ddim_sample takes the same guide hooks).
            u_norm = diffusion.ddim_sample(
                lambda x, t, c, m: apply_fn(
                    params, x, t, c,
                    jnp.zeros((x.shape[0], 1), x.dtype) if m is None else m,
                ),
                (n_candidates, horizon, control_dim),
                key,
                context=ctx,
                w=w,
                guide=guide_builder(x0) if guide_builder is not None else None,
                n_guide_steps=n_guide_steps,
                t_start_guide=t_start_guide,
            )
        else:
            raise ValueError(f"unknown sampler '{sampler}'")
        u_cand = unnormalize(inputs_stats, u_norm)  # (n_candidates, H, du)
        if n_candidates == 1:
            return u_cand[0], u_cand

        # Receding-horizon control only ever applies u[0]; when the model's
        # plan TAILS diverge from the expert's (behavior-cloning compounding
        # — the panda's open-loop horizon cost runs ~9x the expert's while
        # its closed loop is within 3.1%), scoring candidates on the full
        # horizon ranks them by tail noise, not by the quality of the next
        # few actions. `selection_horizon` truncates the scored rollout to
        # the credible prefix (terminal cost only when the full plan is
        # scored, since a truncated rollout's last state is not the plan's
        # terminal state).
        sel_h = selection_horizon or u_cand.shape[1]

        def horizon_cost(u_seq):
            def body(carry, u):
                x, acc = carry
                acc = acc + cost.stage(x, u)
                return (plant.step(x, u), acc), None

            (x_f, acc), _ = jax.lax.scan(
                body, (x0, jnp.float32(0.0)), u_seq[:sel_h])
            if sel_h == u_cand.shape[1]:
                acc = acc + cost.terminal(x_f)
            return acc

        costs = jax.vmap(horizon_cost)(u_cand)
        return u_cand[jnp.argmin(costs)], u_cand

    return replan


def make_closed_loop(
    diffusion: GaussianDiffusion,
    apply_fn: Callable,
    inputs_stats: NormalizerStats,
    condition_stats: NormalizerStats,
    plant: Plant,
    cost: QuadraticCost,
    horizon: int,
    n_steps: int = 80,
    w: float = 0.01,
    n_diffusion_steps_without_noise: int = 5,
    n_candidates: int = 1,
    state_to_condition: Optional[Callable] = None,
    sampler: str = "ddpm",
    sample_override: Optional[Callable] = None,
    guide_builder: Optional[Callable] = None,
    n_guide_steps: int = 1,
    t_start_guide: float = float("inf"),
    selection_horizon: Optional[int] = None,
):
    """Build the fully-fused closed loop:
    ``closed_loop(params, x0, key) -> ClosedLoopResult``.

    ``state_to_condition`` maps the plant state to the conditioning vector
    (identity by default; e.g. recompute theta* from theta each step).
    ``guide_builder`` threads a per-replan cost-gradient guide into the CFG
    sampler (see `make_replan_fn`).
    Workload constants default to the reference's flagship run: 80 steps,
    horizon 32, T=25+5, w=0.01 (`Diffusion_MPC_Inference.py:31-34,94-97`).
    """
    replan = make_replan_fn(
        diffusion, apply_fn, inputs_stats, condition_stats,
        horizon, plant.control_dim, w, n_diffusion_steps_without_noise,
        n_candidates, plant, cost, sampler, state_to_condition,
        sample_override, guide_builder, n_guide_steps, t_start_guide,
        selection_horizon,
    )

    def closed_loop(params, x0, key):
        # all replan keys derived in one split outside the scan
        replan_keys = jax.random.split(key, n_steps)

        def body(x, k_replan):
            u_hor, _ = replan(params, x, k_replan)
            u0 = u_hor[0]
            stage = cost.stage(x, u0)
            x_next = plant.step(x, u0)
            return x_next, (x_next, u0, u_hor, stage)

        x_f, (xs, us, u_hors, stages) = jax.lax.scan(body, x0, replan_keys)
        return ClosedLoopResult(
            x_track=jnp.concatenate([x0[None], xs], axis=0),
            u_track=us,
            u_horizons=u_hors,
            stage_costs=stages,
        )

    return closed_loop


def make_nmpc_closed_loop(
    plant: Plant,
    cost: QuadraticCost,
    solver_config: ILQRConfig,
    n_steps: int = 80,
    u_init_scale: float = 0.0,
    warm_start: bool = True,
):
    """iLQR-based NMPC closed loop — the expert baseline the diffusion
    controller is compared against (replaces the per-step CasADi/IPOPT loop,
    `Cart_Diffusion_inference.py:550-595`). ``u_init_scale`` seeds the first
    solve's control sequence (the +/- basin selector); subsequent solves warm
    start from the previous shifted solution."""

    def closed_loop(x0):
        u_init = jnp.full((solver_config.horizon, plant.control_dim), u_init_scale)

        def body(carry, _):
            x, u_ws = carry
            sol = ilqr_solve(plant, cost, x, u_ws, solver_config)
            u0 = sol.us[0]
            stage = cost.stage(x, u0)
            x_next = plant.step(x, u0)
            if warm_start:
                u_next_ws = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
            else:
                u_next_ws = u_init
            return (x_next, u_next_ws), (x_next, u0, sol.us, stage)

        (x_f, _), (xs, us, u_hors, stages) = jax.lax.scan(
            body, (x0, u_init), None, length=n_steps
        )
        return ClosedLoopResult(
            x_track=jnp.concatenate([x0[None], xs], axis=0),
            u_track=us,
            u_horizons=u_hors,
            stage_costs=stages,
        )

    return closed_loop


def make_ampc_closed_loop(
    ampc_apply: Callable,
    inputs_stats: NormalizerStats,
    condition_stats: NormalizerStats,
    plant: Plant,
    cost: QuadraticCost,
    n_steps: int = 80,
    state_to_condition: Optional[Callable] = None,
):
    """Closed loop driven by the AMPC MLP baseline (reference
    `NMPC_NN_Inference.py:384-458` / `NN_MPC_Inference.py`): per step the MLP
    regresses the whole normalized u-horizon from the normalized state; the
    first control is applied. Deterministic (no sampling), one jitted scan."""
    to_cond = state_to_condition or (lambda x: x)

    def closed_loop(params, x0):
        def body(x, _):
            cond = normalize(condition_stats, to_cond(x))[None, :]
            u_norm = ampc_apply(params, cond)  # (1, H, du)
            u_hor = unnormalize(inputs_stats, u_norm)[0]
            u0 = u_hor[0]
            stage = cost.stage(x, u0)
            x_next = plant.step(x, u0)
            return x_next, (x_next, u0, u_hor, stage)

        x_f, (xs, us, u_hors, stages) = jax.lax.scan(body, x0, None, length=n_steps)
        return ClosedLoopResult(
            x_track=jnp.concatenate([x0[None], xs], axis=0),
            u_track=us,
            u_horizons=u_hors,
            stage_costs=stages,
        )

    return closed_loop
