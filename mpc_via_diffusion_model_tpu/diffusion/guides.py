"""Classifier-guidance zoo: differentiable trajectory costs + guide manager.

Rebuild of `mpd/models/diffusion_models/guides.py`. The reference wraps torch
autograd in nn.Modules; here a *guide* is just a reward function
``r(x) -> (...,)`` (to MAXIMIZE, matching the reference's ``-1 * cost``
convention), and the manager composes them into the ``guide(x) -> grad``
hook that `GaussianDiffusion.ddpm_sample` / `ddim_sample` consume:

    unnormalize -> sum_i w_i r_i -> jax.grad -> clip (norm/value) ->
    zero gradients at the start/goal points -> scaled gradient

(reference `GuideManagerTrajectories.forward`, `guides.py:62-148`).

Guide functions mirror the reference classes:
- collision_avoidance_guide        <- GuideCollisionAvoidance (`guides.py:444`)
- smoothness_finite_difference_guide <- GuideSmoothnessFiniteDifferenceVelocity (`:458`)
- gp_prior_guide                   <- GuideSmoothnessGPPrior / CostGPTrajectory (`:478`)
- state_goal_guide                 <- GuideStateGoal (`:492`)
- first_order_smoothness_guide     <- GuideTrajectorySmoothnessFirstOrder (`:507`)
- last_point_guide                 <- GuideTrajectoryLastPoint (`:567`)
- multi_sphere_obstacle_guide      <- GuideTrajectoryObstacleAvoidanceMultiSphere (`:585`)
- se3_orientation_goal_guide       <- GuideSE3OrientationGoal (`:522-564`)
- control_effort_guide             <- GuideManagerCartPole live path (`:371-422`):
  grad = -scale * clip(2 * sum|u|) in normalized space
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..envs.planning2d import PlanningEnv2D, interpolate_points, smooth_distance_penalty


def _safe_norm(v, axis=-1, eps=1e-12):
    """L2 norm with a finite gradient at 0 (guides differentiate through
    degenerate segments, e.g. two identical waypoints)."""
    import jax.numpy as jnp

    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axis) + eps)

__all__ = [
    "make_guide",
    "collision_avoidance_guide",
    "config_collision_avoidance_guide",
    "smoothness_finite_difference_guide",
    "gp_prior_guide",
    "state_goal_guide",
    "first_order_smoothness_guide",
    "last_point_guide",
    "multi_sphere_obstacle_guide",
    "se3_orientation_goal_guide",
    "control_effort_guide",
    "stochgpmp_guide",
]

RewardFn = Callable[[jnp.ndarray], jnp.ndarray]


def make_guide(
    rewards: Sequence[Tuple[RewardFn, float]],
    unnormalize_fn: Optional[Callable] = None,
    clip_grad: bool = False,
    clip_grad_rule: str = "norm",
    max_grad_norm: float = 1.0,
    max_grad_value: float = 0.1,
    zero_endpoints: bool = True,
    scale: float = 1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Compose weighted reward gradients into a sampler guide hook.

    Args:
      rewards: [(reward_fn, weight)]; each fn maps unnormalized trajectories
        (B, H, D) -> (B,) rewards (maximize).
      unnormalize_fn: applied before the rewards (guides live in unnormalized
        space, reference `guides.py:69-72`); gradients flow through it.
      clip_grad_rule: 'norm' (per-trajectory) or 'value' (elementwise),
        reference `clip_gradient` (`guides.py:130-140`).
      zero_endpoints: zero the gradient at timesteps 0 and H-1 (hard-cond
      protection, reference `guides.py:103-108`).
    """

    def total_reward(x_norm):
        x = unnormalize_fn(x_norm) if unnormalize_fn is not None else x_norm
        out = 0.0
        for fn, w in rewards:
            out = out + w * jnp.sum(fn(x))
        return out

    grad_fn = jax.grad(total_reward)

    def guide(x_norm: jnp.ndarray) -> jnp.ndarray:
        g = grad_fn(x_norm)
        if clip_grad:
            if clip_grad_rule == "norm":
                norm = jnp.linalg.norm(
                    g.reshape(g.shape[0], -1), axis=-1, keepdims=True
                ).reshape(g.shape[0], *([1] * (g.ndim - 1)))
                g = g * jnp.minimum(1.0, max_grad_norm / (norm + 1e-12))
            elif clip_grad_rule == "value":
                g = jnp.clip(g, -max_grad_value, max_grad_value)
            else:
                raise ValueError(f"unknown clip rule {clip_grad_rule}")
        if zero_endpoints:
            g = g.at[..., 0, :].set(0.0)
            g = g.at[..., -1, :].set(0.0)
        return scale * g

    return guide


# --------------------------------------------------------------------------- #
# reward functions (maximize)
# --------------------------------------------------------------------------- #

def collision_avoidance_guide(env: PlanningEnv2D, max_sdf: float = 0.1, num_interpolated_points: int = 0) -> RewardFn:
    """- sum of smooth SDF collision penalties (reference `guides.py:444-456`).
    With ``num_interpolated_points`` > 0 the trajectory is densified before
    the SDF (reference `interpolate_trajectories_for_collision`)."""

    def reward(x):
        pts = x[..., :2]
        if num_interpolated_points:
            pts = interpolate_points(pts, num_interpolated_points)
        return -jnp.sum(env.compute_collision_cost(pts, max_sdf), axis=-1)

    return reward


def config_collision_avoidance_guide(arm_env, max_sdf: float = 0.05) -> RewardFn:
    """- sum of smooth collision penalties on CONFIGURATION-space
    trajectories (..., H, q_dim): the arm analogue of
    `collision_avoidance_guide`, differentiating the robot's collision-
    sphere clearance through forward kinematics
    (`envs/planning3d.PandaArmEnv3D.compute_collision_cost`). Matches the
    reference's GuideCollisionAvoidance applied to its collision-sphere
    robots (`guides.py:444-456` with RobotPanda task-space spheres)."""

    def reward(x):
        return -jnp.sum(arm_env.compute_collision_cost(x, max_sdf), axis=-1)

    return reward


def smoothness_finite_difference_guide(dt: float = 1.0) -> RewardFn:
    """- sum of central-difference acceleration norms
    (reference `guides.py:458-475`)."""

    def reward(x):
        vel = jnp.diff(x, axis=-2) / dt
        acc = 0.5 * (vel[..., 1:, :] - vel[..., :-1, :])
        return -jnp.sum(_safe_norm(acc), axis=-1)

    return reward


def gp_prior_guide(dt: float, sigma: float = 1.0) -> RewardFn:
    """Constant-velocity GP-prior factor cost on (q, qdot) trajectories
    (reference `GuideSmoothnessGPPrior` via mp_baselines `CostGPTrajectory`,
    `guides.py:478-489`): sum ||x_{t+1} - Phi x_t||^2_{Qinv} with
    Phi = [[I, dt I], [0, I]] and the standard white-noise-on-acceleration
    Q(sigma, dt)."""

    def reward(x):
        d = x.shape[-1] // 2
        q, qd = x[..., :d], x[..., d:]
        q_pred = q[..., :-1, :] + dt * qd[..., :-1, :]
        qd_pred = qd[..., :-1, :]
        eq = q[..., 1:, :] - q_pred
        ed = qd[..., 1:, :] - qd_pred
        # Qinv for white-noise-on-acceleration model
        q11 = 12.0 / (sigma ** 2 * dt ** 3)
        q12 = -6.0 / (sigma ** 2 * dt ** 2)
        q22 = 4.0 / (sigma ** 2 * dt)
        cost = (
            q11 * jnp.sum(eq * eq, axis=(-1, -2))
            + 2 * q12 * jnp.sum(eq * ed, axis=(-1, -2))
            + q22 * jnp.sum(ed * ed, axis=(-1, -2))
        )
        return -0.5 * cost

    return reward


def state_goal_guide(state_des: jnp.ndarray, idx: int) -> RewardFn:
    """- distance of x[idx] to a desired state (reference `guides.py:492-504`)."""

    def reward(x):
        return -_safe_norm(x[..., idx, :] - state_des)

    return reward


def first_order_smoothness_guide() -> RewardFn:
    """- path length sum ||q_i - q_{i-1}|| (reference `guides.py:507-519`)."""

    def reward(x):
        return -jnp.sum(_safe_norm(jnp.diff(x, axis=-2)), axis=-1)

    return reward


def last_point_guide(goal_state: jnp.ndarray) -> RewardFn:
    """- distance of the final point to the goal (reference `guides.py:567-583`)."""

    def reward(x):
        return -_safe_norm(x[..., -1, :] - goal_state)

    return reward


def multi_sphere_obstacle_guide(centers: jnp.ndarray, radii: jnp.ndarray, max_sdf: float = 0.1) -> RewardFn:
    """- smooth penalty against a set of spheres (reference `guides.py:585-614`)."""

    def reward(x):
        d = _safe_norm(x[..., None, :2] - centers[..., :2]) - radii
        dmin = jnp.min(d, axis=-1)
        return -jnp.sum(smooth_distance_penalty(dmin, max_sdf), axis=-1)

    return reward


def se3_orientation_goal_guide(
    rot_des: jnp.ndarray,
    w_rot: float = 1.0,
    fk_rot_fn: Optional[Callable] = None,
) -> RewardFn:
    """End-effector orientation goal on joint-space trajectories
    (reference `GuideSE3OrientationGoal`, `guides.py:522-564`).

    The reference builds a desired pose H_des equal to the CURRENT EE pose
    with its rotation block replaced by ``rot_des`` and scores
    ``-SE3_distance(H_ee, H_des, w_rot)``; with identical translations that
    distance reduces to the w_rot-weighted rotation geodesic
    ``sqrt(w_rot) * ||Log(R_ee^T R_des)||``, which is what this computes —
    summed over the horizon, negated (maximize).

    ``fk_rot_fn(q7) -> (3, 3)`` maps one joint configuration to the EE
    rotation; defaults to the library's Panda modified-DH chain
    (`dynamics/arm.py::panda_link_transforms`, the same frames the RNE
    dynamics use). Trajectories are (..., H, 7) joint configs.
    """
    if fk_rot_fn is None:
        from ..dynamics.arm import panda_link_transforms

        def fk_rot_fn(q):
            return panda_link_transforms(q)[-1][0]

    rot_des = jnp.asarray(rot_des, jnp.float32)

    def reward(x):
        lead = x.shape[:-2]
        q_flat = x.reshape((-1, x.shape[-1]))
        r_ee = jax.vmap(fk_rot_fn)(q_flat)  # (N, 3, 3)
        # geodesic angle via the trace identity, clipped inside the open
        # interval so the arccos gradient stays finite at 0 and pi
        tr = jnp.einsum("nij,ij->n", r_ee, rot_des)
        cos = jnp.clip(0.5 * (tr - 1.0), -1.0 + 1e-6, 1.0 - 1e-6)
        ang = jnp.arccos(cos).reshape(lead + x.shape[-2:-1])  # (..., H)
        return -jnp.sqrt(w_rot) * jnp.sum(ang, axis=-1)

    return reward


def stochgpmp_guide(
    rewards: Sequence[Tuple[RewardFn, float]],
    key,
    num_samples: int = 16,
    sigma: float = 0.1,
    lengthscale: int = 5,
    temperature: float = 1.0,
    step_size: float = 0.05,
    unnormalize_fn: Optional[Callable] = None,
    zero_endpoints: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """One step of STOCHASTIC GPMP as a sampler guide — the derivative-free
    counterpart of `make_guide` (reference ``GuideStochGPMP.plan_sgpmp``,
    `guides.py:630-752`: one ``sgpmp_opt_iters=1`` update of a
    sampling-based planner over a CostGP + goal-prior + collision
    composite, returned as the per-step guide 'gradient').

    TPU-native form: draw ``num_samples`` GP-smooth perturbations around the
    current trajectory (white noise filtered along the horizon with a
    length-``lengthscale`` boxcar — the smoothness role of the reference's
    CostGP proposal), score each perturbed trajectory with the weighted
    reward composite, softmax-weight at ``temperature``, and step toward the
    reward-weighted mean perturbation. Everything is one fused batch of
    reward evals — no autodiff through the rewards, so it also guides
    non-differentiable costs. Antithetic pairs (+/- eps) keep the estimator
    unbiased at quadratic order.

    The sampler's guide hook is a pure function of the trajectory, so the
    per-call randomness is derived counter-style from ``key`` and the
    trajectory bits (deterministic per input, fresh across denoise steps).

    ``num_samples`` must be even (antithetic pairs): the guide evaluates the
    reward on exactly ``num_samples`` candidates, half of them mirrored.
    """
    if num_samples < 2 or num_samples % 2 != 0:
        raise ValueError(
            f"stochgpmp_guide needs an even num_samples >= 2 (antithetic "
            f"+/-eps pairs); got {num_samples}")
    base_key = key

    def total_reward(x):
        xs = unnormalize_fn(x) if unnormalize_fn is not None else x
        out = 0.0
        for fn, w in rewards:
            out = out + w * fn(xs)
        return out  # (...batch,)

    def guide(x_norm: jnp.ndarray) -> jnp.ndarray:
        b, h, d = x_norm.shape
        # counter-style per-call key: same x -> same delta (jit-pure), new
        # denoise step -> new draws
        tag = jnp.sum(jax.lax.bitcast_convert_type(x_norm, jnp.int32),
                      dtype=jnp.int32)
        k = jax.random.fold_in(base_key, tag)
        half = num_samples // 2
        eps = jax.random.normal(k, (half, b, h, d), x_norm.dtype)
        # GP-smooth along the horizon: boxcar filter, 'same' padding
        kern = jnp.ones((lengthscale,), x_norm.dtype) / float(lengthscale)
        eps = _boxcar_smooth(eps, kern)
        eps = jnp.concatenate([eps, -eps], axis=0) * sigma  # antithetic
        cand = x_norm[None] + eps                            # (K, B, H, D)
        r = jax.vmap(total_reward)(cand)                     # (K, B)
        w_soft = jax.nn.softmax(r / temperature, axis=0)     # over samples
        delta = jnp.einsum("kb,kbhd->bhd", w_soft, eps)
        if zero_endpoints:
            delta = delta.at[:, 0, :].set(0.0)
            delta = delta.at[:, -1, :].set(0.0)
        return step_size * delta

    return guide


def _boxcar_smooth(eps, kern):
    """Filter (K, B, H, D) noise along H with a 1-D kernel ('same')."""
    k = kern.shape[0]
    kk, b, h, d = eps.shape
    x = eps.transpose(0, 1, 3, 2).reshape(kk * b * d, h, 1)
    w = kern[:, None, None]  # (k, in=1, out=1)
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(k // 2, (k - 1) // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y.reshape(kk, b, d, h).transpose(0, 1, 3, 2)


def control_effort_guide(scale: float = 1e-7) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """The live path of the reference's `GuideManagerCartPole`
    (`guides.py:371-422`): returns the gradient DIRECTLY (not via make_guide):
    grad = -scale * clip(2 * sum|u|, -1, 1) broadcast over the horizon."""

    def guide(u_norm):
        g = 2.0 * jnp.sum(jnp.abs(u_norm), axis=(-1, -2), keepdims=True)
        g = jnp.clip(g, -1.0, 1.0)
        return -scale * g * jnp.ones_like(u_norm)

    return guide
