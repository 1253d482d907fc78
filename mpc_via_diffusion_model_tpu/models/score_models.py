"""Continuous-time score-model family + probability-flow ODE likelihood.

Rebuild of the reference's score-model stack (`mpd/models/diffusion_models/
score_model_base.py`, `mlp_score_model.py`, `sbm_likelihood.py`). NOTE: in
the reference this family is DEAD CODE — it imports
`mpd.models.helpers.marginal_prob`, which does not exist anywhere in the repo
(`score_model_base.py:3`), so it cannot run. This is the working equivalent:

- VE-SDE marginal: sigma(t) = sigma_min (sigma_max/sigma_min)^t — the
  `marginal_prob_std` the reference meant to import,
- ScoreMLP: an MLP score network whose output is normalized by sigma(t)
  (mirroring `ScoreModelBase.forward` dividing by the marginal std),
- `ode_likelihood`: log p(x) via the probability-flow ODE with the
  Skilling-Hutchinson divergence estimator (`sbm_likelihood.py:14`),
  integrated with `jax.experimental.ode.odeint` instead of scipy solve_ivp —
  jit/vmap-able, runs on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ACTIVATIONS

__all__ = ["ve_marginal_prob_std", "ve_diffusion_coeff", "ScoreMLP",
           "ContextScoreMLP", "SDFScoreMLP", "SharedFeatureSDFScoreMLP",
           "ode_likelihood"]


def ve_marginal_prob_std(t: jnp.ndarray, sigma_min: float = 0.01, sigma_max: float = 50.0) -> jnp.ndarray:
    """Std of p_t(x | x_0) for the VE SDE (geometric sigma schedule)."""
    return sigma_min * (sigma_max / sigma_min) ** t


def ve_diffusion_coeff(t: jnp.ndarray, sigma_min: float = 0.01, sigma_max: float = 50.0) -> jnp.ndarray:
    """g(t) for the VE SDE: sigma(t) * sqrt(2 log(sigma_max/sigma_min))."""
    import numpy as np

    return ve_marginal_prob_std(t, sigma_min, sigma_max) * jnp.sqrt(
        2.0 * np.log(sigma_max / sigma_min)
    )


class GaussianFourierFeatures(nn.Module):
    """Random Fourier time embedding (reference `GaussianFourierProjection`,
    `layers.py:85-96`; weights fixed at init, not trained)."""

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "W",
            lambda k, shape: jax.random.normal(k, shape) * self.scale,
            (self.embed_dim // 2,),
        )
        w = jax.lax.stop_gradient(w)  # frozen, like requires_grad=False
        proj = t[:, None] * w[None, :] * 2.0 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class ScoreMLP(nn.Module):
    """MLP score model s(x, t) ~= grad log p_t(x), output scaled by
    1/sigma(t) (reference `MLPScoreModel` + `ScoreModelBase.forward`)."""

    x_dim: int
    hidden_dim: int = 128
    embed_dim: int = 64
    act: str = "mish"
    sigma_min: float = 0.01
    sigma_max: float = 50.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """x: (B, D); t: (B,) in (0, 1]."""
        act = ACTIVATIONS[self.act]
        emb = act(nn.Dense(self.embed_dim)(GaussianFourierFeatures(self.embed_dim)(t)))
        h = jnp.concatenate([x, emb], axis=-1)
        h = act(nn.Dense(self.hidden_dim)(h))
        h = act(nn.Dense(self.hidden_dim)(h))
        h = nn.Dense(self.x_dim)(h)
        sigma = ve_marginal_prob_std(t, self.sigma_min, self.sigma_max)
        return h / sigma[:, None]


def score_matching_loss(apply_fn, params, x0, key, sigma_min=0.01, sigma_max=50.0, eps=1e-5):
    """Denoising score matching loss for the VE SDE."""
    k_t, k_z = jax.random.split(key)
    b = x0.shape[0]
    t = jax.random.uniform(k_t, (b,), minval=eps, maxval=1.0)
    z = jax.random.normal(k_z, x0.shape)
    sigma = ve_marginal_prob_std(t, sigma_min, sigma_max)[:, None]
    x_t = x0 + sigma * z
    score = apply_fn(params, x_t, t)
    return jnp.mean(jnp.sum(jnp.square(score * sigma + z), axis=-1))


def ode_likelihood(
    apply_fn: Callable,
    params,
    x: jnp.ndarray,
    key: jax.Array,
    sigma_min: float = 0.01,
    sigma_max: float = 50.0,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """log-likelihood via the probability-flow ODE (reference
    `sbm_likelihood.py:14`, scipy solve_ivp -> odeint).

    Returns (z_T latent, log p(x) per example, in nats).
    """
    from jax.experimental.ode import odeint

    b, d = x.shape
    eps_sh = jax.random.rademacher(key, x.shape).astype(x.dtype)

    def drift(xx, t):
        tb = jnp.full((b,), t)
        g2 = ve_diffusion_coeff(tb, sigma_min, sigma_max)[:, None] ** 2
        return -0.5 * g2 * apply_fn(params, xx, tb)

    def ode_fn(state, t):
        xx, _ = state
        f, vjp = jax.vjp(lambda v: drift(v, t), xx)
        (eps_vjp,) = vjp(eps_sh)
        div = jnp.sum(eps_vjp * eps_sh, axis=-1)
        return f, div

    ts = jnp.array([eps, 1.0])
    (x_out, logdet) = odeint(ode_fn, (x, jnp.zeros((b,))), ts, rtol=1e-4, atol=1e-4)
    z = x_out[-1]
    delta_logp = logdet[-1]
    sigma_t = ve_marginal_prob_std(jnp.float32(1.0), sigma_min, sigma_max)
    prior_logp = -0.5 * d * jnp.log(2 * jnp.pi * sigma_t ** 2) - jnp.sum(z ** 2, axis=-1) / (
        2 * sigma_t ** 2
    )
    return z, prior_logp + delta_logp


# --------------------------------------------------------------------------- #
# context / SDF score-model variants
# --------------------------------------------------------------------------- #

class ContextScoreMLP(nn.Module):
    """Context-conditioned score MLP (reference `ContextScoreModel`,
    `mlp_score_model.py:79-122` — dead code there, working here).

    The reference threads dict fields through env/task sub-encoders and
    concatenates ``(x, env, task, start, time_embed)``; here the encoders are
    explicit inner MLPs and the call takes the raw feature arrays:
    ``__call__(x, t, env_feat, task_feat, start)``. Output is the score,
    scaled by 1/sigma(t) like `ScoreMLP`.
    """

    x_dim: int
    hidden_dim: int = 128
    embed_dim: int = 64
    env_embed_dim: int = 16
    task_embed_dim: int = 16
    act: str = "mish"
    sigma_min: float = 0.01
    sigma_max: float = 50.0

    @nn.compact
    def __call__(self, x, t, env_feat, task_feat, start):
        act = ACTIVATIONS[self.act]
        emb = act(nn.Dense(self.embed_dim)(GaussianFourierFeatures(self.embed_dim)(t)))
        env = act(nn.Dense(self.env_embed_dim)(env_feat))
        task = act(nn.Dense(self.task_embed_dim)(task_feat))
        h = jnp.concatenate([x, env, task, start, emb], axis=-1)
        h = act(nn.Dense(self.hidden_dim)(h))
        h = act(nn.Dense(self.hidden_dim)(h))
        h = nn.Dense(self.x_dim)(h)
        sigma = ve_marginal_prob_std(t, self.sigma_min, self.sigma_max)
        return h / sigma[:, None]


class SDFScoreMLP(nn.Module):
    """Score MLP conditioned on signed-distance-field values at the
    trajectory's waypoints (reference `SDFScoreModel`,
    `mlp_score_model.py:124-176`).

    ``sdf_fn(points (..., 2)) -> (...,)`` is the environment SDF (e.g.
    `envs.planning2d.PlanningEnv2D.sdf`); with ``use_sdf_value`` the
    per-waypoint SDF values join the conditioning vector, mirroring the
    reference's ``use_sdf_value`` switch. x is a flattened 2-D trajectory
    (B, n_support_points * 2).
    """

    n_support_points: int
    hidden_dim: int = 128
    embed_dim: int = 64
    env_embed_dim: int = 16
    task_embed_dim: int = 16
    use_sdf_value: bool = True
    act: str = "mish"
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    sdf_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, t, env_feat, task_feat):
        if self.use_sdf_value and self.sdf_fn is None:
            raise ValueError(
                "SDFScoreMLP(use_sdf_value=True) needs an environment SDF: "
                "pass sdf_fn=env.sdf (e.g. envs.planning2d.PlanningEnv2D.sdf)"
                " or construct with use_sdf_value=False")
        act = ACTIVATIONS[self.act]
        b = x.shape[0]
        emb = act(nn.Dense(self.embed_dim)(GaussianFourierFeatures(self.embed_dim)(t)))
        env = act(nn.Dense(self.env_embed_dim)(env_feat))
        task = act(nn.Dense(self.task_embed_dim)(task_feat))
        parts = [x, env, task, emb]
        if self.use_sdf_value:
            pts = x.reshape(b, self.n_support_points, 2)
            parts.insert(1, self.sdf_fn(pts).reshape(b, self.n_support_points))
        h = jnp.concatenate(parts, axis=-1)
        h = act(nn.Dense(self.hidden_dim)(h))
        h = act(nn.Dense(self.hidden_dim)(h))
        h = nn.Dense(self.n_support_points * 2)(h)
        sigma = ve_marginal_prob_std(t, self.sigma_min, self.sigma_max)
        return h / sigma[:, None]


class SharedFeatureSDFScoreMLP(nn.Module):
    """Score MLP whose conditioning includes LEARNED SDF features evaluated
    at the trajectory waypoints (reference `SharedFeatureSDFScoreModel`,
    `mlp_score_model.py:178-220`): a small feature net phi(point) is shared
    across waypoints (the reference's sdf_model.feature_field), its outputs
    pooled over the horizon and concatenated with task/start/time."""

    n_support_points: int
    hidden_dim: int = 128
    embed_dim: int = 64
    sdf_feature_dim: int = 16
    task_embed_dim: int = 16
    act: str = "mish"
    sigma_min: float = 0.01
    sigma_max: float = 50.0

    @nn.compact
    def __call__(self, x, t, task_feat, start):
        act = ACTIVATIONS[self.act]
        b = x.shape[0]
        emb = act(nn.Dense(self.embed_dim)(GaussianFourierFeatures(self.embed_dim)(t)))
        pts = x.reshape(b, self.n_support_points, 2)
        phi = act(nn.Dense(self.sdf_feature_dim)(act(nn.Dense(self.sdf_feature_dim)(pts))))
        sdf_features = jnp.mean(phi, axis=1)  # (b, sdf_feature_dim)
        task = act(nn.Dense(self.task_embed_dim)(task_feat))
        h = jnp.concatenate([x, sdf_features, task, start, emb], axis=-1)
        h = act(nn.Dense(self.hidden_dim)(h))
        h = act(nn.Dense(self.hidden_dim)(h))
        h = nn.Dense(self.n_support_points * 2)(h)
        sigma = ve_marginal_prob_std(t, self.sigma_min, self.sigma_max)
        return h / sigma[:, None]
