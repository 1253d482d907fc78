"""Trajectory (motion-planning) datasets + in-framework data generation.

Rebuild of `mpd/datasets/trajectories.py` (`TrajectoryDataset`): holds
collision-free position(+velocity) trajectories in a fixed environment,
normalizes them, serves (trajectory, task=(start, goal)) pairs, and builds
the hard (inpainting) conditions {0: start, H-1: goal} (reference
`trajectories.py:221-244`).

Dataset *generation* replaces the reference's external
RRTConnect -> GPMP2 `HybridPlanner` (`generate_trajectories.py:20-130`) with
a batched GPMP-style trajectory optimizer: straight-line initializations
(plus random via-point perturbations for diversity) refined by Adam on a
differentiable objective = GP-prior smoothness + SDF collision penalty, all
vmapped over (tasks x samples) on device.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs.planning2d import PlanningEnv2D
from .normalization import DatasetNormalizer

__all__ = ["TrajectoryDataset", "generate_trajectories_gpmp",
           "generate_arm_trajectories_gpmp"]

FIELD_TRAJS = "trajs"
FIELD_TASKS = "tasks"


@dataclasses.dataclass(frozen=True)
class TrajectoryDataset:
    """Device-resident trajectory dataset (fixed environment)."""

    trajs: jnp.ndarray  # (B, H, d) positions (optionally + velocities)
    tasks: jnp.ndarray  # (B, 2*q_dim) start|goal positions
    trajs_normalized: jnp.ndarray
    tasks_normalized: jnp.ndarray
    normalizer: DatasetNormalizer
    env: Optional[PlanningEnv2D] = None

    @classmethod
    def from_arrays(cls, trajs, env: Optional[PlanningEnv2D] = None, normalizer: str = "LimitsNormalizer") -> "TrajectoryDataset":
        trajs = np.asarray(trajs, dtype=np.float32)
        q_dim = trajs.shape[-1]
        tasks = np.concatenate([trajs[:, 0, :], trajs[:, -1, :]], axis=-1)
        dn = DatasetNormalizer.fit({FIELD_TRAJS: trajs, FIELD_TASKS: tasks}, kind=normalizer)
        trajs_j, tasks_j = jnp.asarray(trajs), jnp.asarray(tasks)
        return cls(
            trajs=trajs_j,
            tasks=tasks_j,
            trajs_normalized=dn.normalize(trajs_j, FIELD_TRAJS),
            tasks_normalized=dn.normalize(tasks_j, FIELD_TASKS),
            normalizer=dn,
            env=env,
        )

    @property
    def n_trajs(self) -> int:
        return int(self.trajs.shape[0])

    @property
    def n_support_points(self) -> int:
        return int(self.trajs.shape[1])

    @property
    def state_dim(self) -> int:
        return int(self.trajs.shape[2])

    def __len__(self) -> int:
        return self.n_trajs

    def batch(self, key: jax.Array, batch_size: int):
        idx = jax.random.randint(key, (batch_size,), 0, self.n_trajs)
        return self.trajs_normalized[idx], self.tasks_normalized[idx]

    def normalize_trajectories(self, x):
        return self.normalizer.normalize(x, FIELD_TRAJS)

    def unnormalize_trajectories(self, x):
        return self.normalizer.unnormalize(x, FIELD_TRAJS)

    def get_hard_conditions(self, start: jnp.ndarray, goal: jnp.ndarray, n_samples: int = 1, normalize: bool = True):
        """Hard conds {0: start, H-1: goal} as (indices, values) for
        `apply_hard_conds` (reference `trajectories.py:221-244`)."""
        if normalize:
            # start/goal are positions; normalize with the trajectory stats
            start = self.normalizer.normalize(start, FIELD_TRAJS)
            goal = self.normalizer.normalize(goal, FIELD_TRAJS)
        idx = jnp.array([0, self.n_support_points - 1])
        values = jnp.stack([start, goal], axis=0)[None].repeat(n_samples, axis=0)
        return idx, values


def generate_trajectories_gpmp(
    env: PlanningEnv2D,
    key: jax.Array,
    n_tasks: int = 16,
    n_trajs_per_task: int = 8,
    horizon: int = 64,
    n_opt_steps: int = 300,
    lr: float = 2e-2,
    w_collision: float = 10.0,
    w_smooth: float = 1.0,
    min_start_goal_dist: float = 0.8,
    via_scale: float = 0.3,
    collision_margin: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched GPMP-style trajectory generation.

    Returns (trajs (n_tasks*n_trajs_per_task, H, 2), valid mask (same B,)).
    Multi-modality comes from random via-point bumps on the straight-line
    initializations (different homotopy classes survive optimization).
    """
    k_start, k_goal, k_via, k_opt = jax.random.split(key, 4)
    starts = env.random_free_points(k_start, n_tasks)
    goals = env.random_free_points(k_goal, n_tasks)
    # push starts/goals apart (resample goals that are too close by mirroring)
    too_close = jnp.linalg.norm(starts - goals, axis=-1) < min_start_goal_dist
    goals = jnp.where(too_close[:, None], -starts, goals)

    t_lin = jnp.linspace(0.0, 1.0, horizon)[None, :, None]

    def init_traj(start, goal, k):
        base = start[None, :] * (1 - t_lin[0]) + goal[None, :] * t_lin[0]
        bump_dir = jax.random.normal(k, (2,))
        bump = jnp.sin(jnp.pi * t_lin[0, :, 0])[:, None] * bump_dir * via_scale
        return base + bump

    def objective(traj_free, start, goal):
        traj = jnp.concatenate([start[None], traj_free, goal[None]], axis=0)
        vel = jnp.diff(traj, axis=0)
        acc = jnp.diff(vel, axis=0)
        smooth = jnp.sum(acc * acc) + 0.1 * jnp.sum(vel * vel)
        coll = jnp.sum(env.compute_collision_cost(traj))
        return w_smooth * smooth + w_collision * coll

    def optimize(start, goal, k):
        traj0 = init_traj(start, goal, k)[1:-1]
        opt = optax.adam(lr)
        state = opt.init(traj0)

        def step(carry, _):
            traj, st = carry
            g = jax.grad(objective)(traj, start, goal)
            updates, st = opt.update(g, st)
            return (optax.apply_updates(traj, updates), st), None

        (traj, _), _ = jax.lax.scan(step, (traj0, state), None, length=n_opt_steps)
        full = jnp.concatenate([start[None], traj, goal[None]], axis=0)
        valid = jnp.all(env.sdf(full) > collision_margin)
        return full, valid

    # (tasks x samples) fan-out
    starts_r = jnp.repeat(starts, n_trajs_per_task, axis=0)
    goals_r = jnp.repeat(goals, n_trajs_per_task, axis=0)
    keys = jax.random.split(k_via, starts_r.shape[0])
    trajs, valid = jax.jit(jax.vmap(optimize))(starts_r, goals_r, keys)
    return trajs, valid


def generate_arm_trajectories_gpmp(
    arm_env,
    key: jax.Array,
    n_tasks: int = 16,
    n_trajs_per_task: int = 8,
    horizon: int = 64,
    n_opt_steps: int = 400,
    lr: float = 2e-2,
    w_collision: float = 20.0,
    w_smooth: float = 1.0,
    min_start_goal_dist: float = 1.5,
    via_scale: float = 0.5,
    collision_margin: float = 0.0,
    max_sdf: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`generate_trajectories_gpmp` for CONFIGURATION-space arm planning
    (`envs/planning3d.PandaArmEnv3D`): straight joint-space interpolations
    (+ sinusoidal via bumps for homotopy diversity) refined by Adam on
    GP-prior smoothness + the robot's FK collision-sphere penalty, vmapped
    over (tasks x samples) — replacing the reference's external
    RRTConnect -> GPMP2 pipeline (`generate_trajectories.py:20-130`) run on
    its 3-D robot envs (`mpd/datasets/trajectories.py:44-55`).

    Returns (trajs (n_tasks*n_trajs_per_task, H, q_dim), valid (B,)).
    ``min_start_goal_dist`` is in joint-space L2 (radians)."""
    k_start, k_goal, k_resample, k_via = jax.random.split(key, 4)
    starts = arm_env.random_free_points(k_start, n_tasks)
    goals = arm_env.random_free_points(k_goal, n_tasks)
    # push trivial (start ~ goal) tasks apart by redrawing goals from an
    # independent key — one redraw suffices at these joint-space scales
    too_close = jnp.linalg.norm(starts - goals, axis=-1) < min_start_goal_dist
    goals2 = arm_env.random_free_points(k_resample, n_tasks)
    goals = jnp.where(too_close[:, None], goals2, goals)

    q_dim = starts.shape[-1]
    t_lin = jnp.linspace(0.0, 1.0, horizon)[:, None]

    def init_traj(start, goal, k):
        base = start[None, :] * (1 - t_lin) + goal[None, :] * t_lin
        bump_dir = jax.random.normal(k, (q_dim,))
        bump = jnp.sin(jnp.pi * t_lin[:, 0])[:, None] * bump_dir * via_scale
        return base + bump

    def objective(traj_free, start, goal):
        traj = jnp.concatenate([start[None], traj_free, goal[None]], axis=0)
        vel = jnp.diff(traj, axis=0)
        acc = jnp.diff(vel, axis=0)
        smooth = jnp.sum(acc * acc) + 0.1 * jnp.sum(vel * vel)
        coll = jnp.sum(arm_env.compute_collision_cost(traj, max_sdf))
        return w_smooth * smooth + w_collision * coll

    def optimize(start, goal, k):
        traj0 = init_traj(start, goal, k)[1:-1]
        opt = optax.adam(lr)
        state = opt.init(traj0)

        def step(carry, _):
            traj, st = carry
            g = jax.grad(objective)(traj, start, goal)
            updates, st = opt.update(g, st)
            return (optax.apply_updates(traj, updates), st), None

        (traj, _), _ = jax.lax.scan(step, (traj0, state), None, length=n_opt_steps)
        full = jnp.concatenate([start[None], traj, goal[None]], axis=0)
        valid = jnp.all(arm_env.sdf(full) > collision_margin)
        return full, valid

    starts_r = jnp.repeat(starts, n_trajs_per_task, axis=0)
    goals_r = jnp.repeat(goals, n_trajs_per_task, axis=0)
    keys = jax.random.split(k_via, starts_r.shape[0])
    trajs, valid = jax.jit(jax.vmap(optimize))(starts_r, goals_r, keys)
    return trajs, valid
