"""12-state quadrotor plant for long-horizon planning with obstacle costs.

This is the BASELINE.json configs[4] workload ("Quadrotor 12-state
long-horizon planning with obstacle-avoidance cost guidance"); the reference
has no quadrotor, so this follows the standard small-angle rigid-body model:
state (p[3], v[3], rpy[3], omega[3]), controls (total thrust, body torques),
Euler-forward integration.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Plant, QuadraticCost

__all__ = ["quadrotor", "quadrotor_cost", "obstacle_cost",
           "obstacle_cost_single"]

_G = 9.81


def quadrotor(
    dt: float = 0.02,
    m: float = 1.0,
    ixx: float = 0.01,
    iyy: float = 0.01,
    izz: float = 0.02,
) -> Plant:
    inertia = jnp.array([ixx, iyy, izz], dtype=jnp.float32)

    def step(x, u):
        p, v, rpy, omega = x[0:3], x[3:6], x[6:9], x[9:12]
        thrust, tau = u[0], u[1:4]
        phi, theta, psi = rpy[0], rpy[1], rpy[2]

        # body-z in world frame (ZYX Euler)
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        cth, sth = jnp.cos(theta), jnp.sin(theta)
        cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
        z_body = jnp.stack(
            [cpsi * sth * cphi + spsi * sphi, spsi * sth * cphi - cpsi * sphi, cth * cphi]
        )
        acc = z_body * (thrust / m) - jnp.array([0.0, 0.0, _G])

        # Euler-angle kinematics (small-attitude-safe form)
        tth = sth / jnp.maximum(cth, 1e-3)
        rpy_dot = jnp.stack(
            [
                omega[0] + sphi * tth * omega[1] + cphi * tth * omega[2],
                cphi * omega[1] - sphi * omega[2],
                (sphi * omega[1] + cphi * omega[2]) / jnp.maximum(cth, 1e-3),
            ]
        )

        # explicit cross product: jnp.cross lowers through jnp.take (gather),
        # which Mosaic rejects when the step is vmapped over candidates
        # inside the episode kernel ("Only 2D gather is supported" on the
        # quadrotor best-of-K row) — the component formula is gather-free
        # and numerically identical
        iw = inertia * omega
        gyro = jnp.stack([
            omega[1] * iw[2] - omega[2] * iw[1],
            omega[2] * iw[0] - omega[0] * iw[2],
            omega[0] * iw[1] - omega[1] * iw[0],
        ])
        omega_dot = (tau - gyro) / inertia

        xdot = jnp.concatenate([v, acc, rpy_dot, omega_dot])
        return x + xdot * dt

    return Plant(name="quadrotor", state_dim=12, control_dim=4, dt=dt, step=step)


def quadrotor_cost() -> QuadraticCost:
    return QuadraticCost(
        q_diag=jnp.array([10.0, 10.0, 10.0, 1.0, 1.0, 1.0, 5.0, 5.0, 5.0, 0.1, 0.1, 0.1], dtype=jnp.float32),
        r=jnp.array([0.1, 0.5, 0.5, 0.5], dtype=jnp.float32),
        p_diag=jnp.array([100.0, 100.0, 100.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 1.0, 1.0, 1.0], dtype=jnp.float32),
    )


def obstacle_cost(states: jnp.ndarray, centers: jnp.ndarray, radii: jnp.ndarray, weight: float = 100.0) -> jnp.ndarray:
    """Soft sphere-obstacle penalty over a position trajectory.

    Differentiable replacement for the reference's SDF collision guide
    (`mpd/models/diffusion_models/guides.py:444-456`): hinge on penetration
    depth of each (state, obstacle) pair, summed.

    Args:
      states: (..., H, state_dim) with positions in dims 0:3.
      centers: (n_obs, 3); radii: (n_obs,).
    """
    # slice-then-expand: the mixed `[..., None, 0:3]` fancy index traces as
    # a GATHER, which Mosaic cannot lower once the cost is vmapped over
    # candidates inside the episode kernel ("Only 2D gather is supported"
    # on the quadrotor best-of-K row); a plain slice + broadcast is the
    # same values gather-free (jnp.linalg.norm was replaced by explicit
    # sqrt-of-squares for the same reason)
    pos = states[..., 0:3][..., None, :]  # (..., H, 1, 3)
    d = jnp.sqrt(jnp.sum(jnp.square(pos - centers), axis=-1))  # (..., H, n_obs)
    penetration = jnp.maximum(radii - d, 0.0)
    return weight * jnp.sum(jnp.square(penetration), axis=(-1, -2))


def obstacle_cost_single(x: jnp.ndarray, centers: jnp.ndarray,
                         radii: jnp.ndarray, weight: float = 100.0) -> jnp.ndarray:
    """`obstacle_cost` for ONE state vector, Mosaic-kernel-safe.

    The batched form's (..., 1, 3) - (n_obs, 3) broadcast builds a rank-3
    intermediate whose vector-layout inference SIGABRTs the Mosaic kernel
    compiler (layout.h:320 `arr.size() >= layout_rank` check — bisected
    round 4 on the quadrotor in-kernel best-of-K scorer). Unrolling over
    the statically-shaped sphere list keeps every intermediate rank<=1 and
    compiles; values match `obstacle_cost(x[None], ...)` exactly
    (test_obstacle_cost_single_matches_batched). ``centers``/``radii`` may
    be traced (scene-conditioned selection) — only their SHAPE is static.
    """
    pos = x[0:3]
    acc = jnp.float32(0.0)
    for j in range(centers.shape[0]):
        d = jnp.sqrt(jnp.sum(jnp.square(pos - centers[j])))
        pen = jnp.maximum(radii[j] - d, 0.0)
        acc = acc + weight * pen * pen
    return acc
