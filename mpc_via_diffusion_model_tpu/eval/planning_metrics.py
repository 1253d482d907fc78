"""Motion-planning evaluation metrics.

Rebuild of the metric block in `scripts/inference/inference_(mpd).py:306-343`
and `mpd/utils/eval_helpers.py:110-120` (`get_best_index`): success (any
sampled trajectory collision-free), fraction of free trajectories, collision
intensity, smoothness, path length, waypoint variance; best trajectory = the
shortest collision-free one.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..envs.planning2d import PlanningEnv2D, interpolate_points

__all__ = ["planning_metrics", "get_best_index"]


def planning_metrics(env: PlanningEnv2D, trajs: jnp.ndarray, num_interpolated_points: int = 128) -> Dict[str, float]:
    """trajs: (B, H, 2) unnormalized position trajectories.

    Collision is checked on a linear resampling to ``num_interpolated_points``
    so segment crossings between waypoints are caught (the reference
    interpolates for collision checking the same way, `guides.py:33-35`)."""
    dense = interpolate_points(trajs, num_interpolated_points)
    # NaN-robust: a NaN waypoint counts as colliding, not free
    in_coll = jnp.logical_or(env.in_collision(dense), jnp.any(jnp.isnan(dense), axis=-1))  # (B, P)
    free_mask = ~jnp.any(in_coll, axis=-1)  # (B,)
    frac_free = jnp.mean(free_mask.astype(jnp.float32))
    # collision intensity: fraction of colliding waypoints among colliding trajs
    collision_intensity = jnp.mean(in_coll.astype(jnp.float32))

    diffs = jnp.diff(trajs, axis=-2)
    path_len = jnp.sum(jnp.linalg.norm(diffs, axis=-1), axis=-1)  # (B,)
    acc = jnp.diff(diffs, axis=-2)
    smoothness = jnp.sum(jnp.linalg.norm(acc, axis=-1), axis=-1)  # (B,)

    variance_waypoints = jnp.mean(jnp.var(trajs, axis=0))

    return {
        "success": float(jnp.any(free_mask)),
        "fraction_free": float(frac_free),
        "collision_intensity": float(collision_intensity),
        "path_length_mean": float(jnp.mean(path_len)),
        "smoothness_mean": float(jnp.mean(smoothness)),
        "waypoint_variance": float(variance_waypoints),
    }


def get_best_index(env: PlanningEnv2D, trajs: jnp.ndarray, num_interpolated_points: int = 128) -> int:
    """Shortest collision-free trajectory; falls back to least-colliding
    (reference `eval_helpers.py:110-120`)."""
    in_coll = env.in_collision(interpolate_points(trajs, num_interpolated_points))
    free_mask = ~jnp.any(in_coll, axis=-1)
    path_len = jnp.sum(jnp.linalg.norm(jnp.diff(trajs, axis=-2), axis=-1), axis=-1)
    if bool(jnp.any(free_mask)):
        masked = jnp.where(free_mask, path_len, jnp.inf)
        return int(jnp.argmin(masked))
    return int(jnp.argmin(jnp.sum(in_coll, axis=-1)))
