"""Parity and performance metrics for closed-loop evaluation.

Rebuild of the reference's "Performance Check" blocks:
- L1 state/input track differences vs the expert
  (`Diffusion_MPC_Inference.py:483-497`)
- per-step MPC-convention cost (`calMPCCost`,
  `Cart_Diffusion_inference.py:247-283`) via
  `dynamics.reference_mpc_cost`
- left/right modality counting over repeated runs
  (`Cart_Diffusion_inference.py:605-617`)
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.base import Plant, QuadraticCost, reference_mpc_cost
from .runtime import ClosedLoopResult

__all__ = ["track_parity", "per_step_mpc_costs", "count_swing_modes"]


def track_parity(result: ClosedLoopResult, expert: ClosedLoopResult) -> Dict[str, float]:
    """L1 differences between two closed-loop runs, per state dim and input
    (reference `Diffusion_MPC_Inference.py:483-497`)."""
    n = min(result.u_track.shape[0], expert.u_track.shape[0])
    x_diff = jnp.abs(result.x_track[: n + 1] - expert.x_track[: n + 1])
    u_diff = jnp.abs(result.u_track[:n] - expert.u_track[:n])
    out = {f"x{i}_l1": float(jnp.sum(x_diff[:, i])) for i in range(x_diff.shape[1])}
    out["u_l1"] = float(jnp.sum(u_diff))
    out["u_l1_max"] = float(jnp.max(u_diff))
    return out


def per_step_mpc_costs(plant: Plant, cost: QuadraticCost, result: ClosedLoopResult) -> jnp.ndarray:
    """Reference-convention MPC cost of each step's sampled horizon
    (`calMPCCost` applied per control step, `Cart_Diffusion_inference.py:485`)."""
    return jax.vmap(lambda x0, u_hor: reference_mpc_cost(plant, cost, x0, u_hor))(
        result.x_track[:-1], result.u_horizons
    )


def count_swing_modes(theta_tracks: np.ndarray, theta_idx: int = 2) -> Dict[str, int]:
    """Count runs ending left (theta < pi) vs right (theta > pi) of upright —
    the multi-modality check (`Cart_Diffusion_inference.py:605-617`).

    theta_tracks: (n_runs, n_steps+1, state_dim) or (n_runs, n_steps+1)."""
    arr = np.asarray(theta_tracks)
    finals = arr[:, -1, theta_idx] if arr.ndim == 3 else arr[:, -1]
    return {
        "left": int(np.sum(finals < np.pi)),
        "right": int(np.sum(finals >= np.pi)),
    }
