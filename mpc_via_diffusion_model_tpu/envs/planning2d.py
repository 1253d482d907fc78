"""2-D planning environments: differentiable SDF obstacle fields.

TPU-native replacement for the torch_robotics environment/field stack the
reference's motion-planning path depends on (`mpd/datasets/trajectories.py:
11-15,44-55` instantiates external envs; `GuideCollisionAvoidance` calls
`env.compute_collision_cost(x, field_type='sdf')`, reference
`guides.py:444-456`). Environments are frozen pytrees of obstacle primitives
(circles + axis-aligned boxes); the signed distance field and its smooth
collision penalty are pure jnp, differentiable, vmappable.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PlanningEnv2D", "make_random_env", "ENV_SIMPLE_2D", "smooth_distance_penalty", "interpolate_points"]


def _safe_norm(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm over the last axis with a finite gradient at 0."""
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=-1) + eps)


@dataclasses.dataclass(frozen=True)
class PlanningEnv2D:
    """Workspace [-1, 1]^2 with circle and box obstacles.

    circles: (Nc, 3) = (cx, cy, radius); boxes: (Nb, 4) = (cx, cy, half_w,
    half_h). A margin inflates all obstacles for robot radius.
    """

    circles: jnp.ndarray
    boxes: jnp.ndarray
    margin: float = 0.0
    limits: float = 1.0

    # -------------------------------------------------------------- #
    def sdf(self, points: jnp.ndarray) -> jnp.ndarray:
        """Signed distance (positive outside obstacles) for points (..., 2).

        Norms use a tiny epsilon under the sqrt so the gradient is finite at
        degenerate points (a waypoint exactly at a circle center or inside a
        box corner region) — guides differentiate through this."""
        p = points[..., None, :]  # (..., 1, 2)
        d_circles = _safe_norm(p - self.circles[..., :2]) - (
            self.circles[..., 2] + self.margin
        )  # (..., Nc)
        # box SDF (exact outside, -inside depth inside)
        q = jnp.abs(p - self.boxes[..., :2]) - (self.boxes[..., 2:4] + self.margin)
        outside = _safe_norm(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.maximum(q[..., 0], q[..., 1]), 0.0)
        d_boxes = outside + inside  # (..., Nb)
        return jnp.min(jnp.concatenate([d_circles, d_boxes], axis=-1), axis=-1)

    def compute_collision_cost(self, x: jnp.ndarray, max_sdf: float = 0.1) -> jnp.ndarray:
        """Smooth per-point collision penalty over trajectories x (..., H, 2)
        (reference `GuideCollisionAvoidance.forward` + `smooth_distance_penalty`,
        `guides.py:444-456,617-627`)."""
        return smooth_distance_penalty(self.sdf(x), max_sdf)

    def in_collision(self, x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
        """Boolean per-point collision flags."""
        return self.sdf(x) < eps

    def random_free_points(self, key: jax.Array, n: int, min_clearance: float = 0.05, n_attempts: int = 64) -> jnp.ndarray:
        """Rejection-sample n collision-free points (best-of-n_attempts per
        slot; replaces torch_robotics `random_coll_free_q`)."""
        cand = jax.random.uniform(
            key, (n, n_attempts, 2), minval=-self.limits, maxval=self.limits
        )
        d = self.sdf(cand)  # (n, n_attempts)
        best = jnp.argmax(d, axis=-1)
        pts = cand[jnp.arange(n), best]
        return pts


jax.tree_util.register_pytree_node(
    PlanningEnv2D,
    lambda e: ((e.circles, e.boxes), (e.margin, e.limits)),
    lambda aux, leaves: PlanningEnv2D(leaves[0], leaves[1], aux[0], aux[1]),
)



def interpolate_points(trajs: jnp.ndarray, num_points: int = 128) -> jnp.ndarray:
    """Linearly resample a trajectory (..., H, d) to num_points along the
    index axis (reference torch_robotics `interpolate_points_v1`, used for
    finer collision checking, `guides.py:33-35,74-77`)."""
    h = trajs.shape[-2]
    t = jnp.linspace(0.0, h - 1.0, num_points)
    lo = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, h - 2)
    frac = (t - lo)[..., :, None]
    a = jnp.take(trajs, lo, axis=-2)
    b = jnp.take(trajs, lo + 1, axis=-2)
    return a * (1 - frac) + b * frac


def smooth_distance_penalty(d: jnp.ndarray, max_sdf: float = 0.1) -> jnp.ndarray:
    """Hinge-quadratic penalty on signed distance (reference
    `smooth_distance_penalty`, `guides.py:617-627` shape): 0 beyond max_sdf,
    quadratic within the margin, linear inside obstacles."""
    return jnp.where(
        d >= max_sdf,
        0.0,
        jnp.where(d > 0.0, 0.5 / max_sdf * (d - max_sdf) ** 2, 0.5 * max_sdf - d),
    )


def make_random_env(key: jax.Array, n_circles: int = 5, n_boxes: int = 2, r_max: float = 0.25) -> PlanningEnv2D:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    centers_c = jax.random.uniform(k1, (n_circles, 2), minval=-0.7, maxval=0.7)
    radii = jax.random.uniform(k2, (n_circles, 1), minval=0.08, maxval=r_max)
    centers_b = jax.random.uniform(k3, (n_boxes, 2), minval=-0.7, maxval=0.7)
    halfs = jax.random.uniform(k4, (n_boxes, 2), minval=0.05, maxval=r_max)
    return PlanningEnv2D(
        circles=jnp.concatenate([centers_c, radii], axis=-1),
        boxes=jnp.concatenate([centers_b, halfs], axis=-1),
    )


# Fixed simple benchmark env (analog of torch_robotics EnvSimple2D)
ENV_SIMPLE_2D = PlanningEnv2D(
    circles=jnp.array(
        [[0.0, 0.0, 0.25], [-0.5, 0.55, 0.18], [0.55, -0.5, 0.18], [0.5, 0.5, 0.15]],
        dtype=jnp.float32,
    ),
    boxes=jnp.array([[-0.55, -0.55, 0.15, 0.15]], dtype=jnp.float32),
)
