"""Motion-planning inference pipeline (the reference 'mpd' path).

Rebuild of `scripts/inference/inference_(mpd).py:149-343`: sample a batch of
trajectories from an unconditioned temporal U-Net with hard (inpainting)
conditions {0: start, H-1: goal}, cost-gradient guidance active for the last
quarter of the denoising steps (t_start_guide), optional extra guide-only
refinement steps after diffusion, then metric computation and best-trajectory
selection. One jitted program for the sampling; metrics on host.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.trajectories import TrajectoryDataset
from ..diffusion.gaussian_diffusion import GaussianDiffusion, apply_hard_conds
from ..envs.planning2d import PlanningEnv2D
from ..eval.planning_metrics import get_best_index, planning_metrics

__all__ = ["make_planner", "PlanResult"]


@dataclasses.dataclass
class PlanResult:
    trajs: np.ndarray  # (n_samples, H, d) unnormalized
    best_idx: int
    metrics: Dict[str, float]


def make_planner(
    diffusion: GaussianDiffusion,
    apply_fn: Callable,
    dataset: TrajectoryDataset,
    n_samples: int = 25,
    t_start_guide_fraction: float = 0.25,
    n_guide_steps: int = 1,
    n_diffusion_steps_without_noise: int = 5,
    n_post_diffusion_guide_steps: int = 0,
    use_ddim: bool = False,
):
    """Build ``plan(params, start, goal, key, guide=None) -> PlanResult``.

    `t_start_guide_fraction`: guidance becomes active when
    t < ceil(fraction * T) (reference `inference_(mpd).py:254-260`).
    """
    horizon = dataset.n_support_points
    d = dataset.state_dim
    t_start_guide = float(np.ceil(t_start_guide_fraction * diffusion.schedule.n_steps))

    def sample(params, hard_conds, key, guide):
        denoise = lambda x, t, c, m: apply_fn(params, x, t)
        shape = (n_samples, horizon, d)
        if use_ddim:
            x = diffusion.ddim_sample(
                denoise, shape, key, hard_conds=hard_conds,
                guide=guide, n_guide_steps=n_guide_steps, t_start_guide=t_start_guide,
            )
        else:
            x = diffusion.ddpm_sample(
                denoise, shape, key, hard_conds=hard_conds,
                n_diffusion_steps_without_noise=n_diffusion_steps_without_noise,
                guide=guide, n_guide_steps=n_guide_steps, t_start_guide=t_start_guide,
            )
        # post-diffusion guide-only refinement (reference `:279-298`)
        if guide is not None:
            for _ in range(n_post_diffusion_guide_steps):
                x = apply_hard_conds(x + guide(x), hard_conds)
        return x

    sample_jit = jax.jit(sample, static_argnames=("guide",))

    def plan(params, start, goal, key, guide=None) -> PlanResult:
        hard_conds = dataset.get_hard_conditions(start, goal, n_samples=n_samples)
        x_norm = sample_jit(params, hard_conds, key, guide)
        trajs = dataset.unnormalize_trajectories(x_norm)
        env = dataset.env
        metrics = planning_metrics(env, trajs) if env is not None else {}
        best = get_best_index(env, trajs) if env is not None else 0
        return PlanResult(trajs=np.asarray(trajs), best_idx=best, metrics=metrics)

    return plan
