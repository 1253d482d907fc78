"""Diffusion variance schedules and precomputed DDPM coefficient tables.

TPU-native rebuild of the schedule math in the reference
(`mpd/models/diffusion_models/helpers.py:13-62` for the beta schedules and
`mpd/models/diffusion_models/diffusion_model_base.py:73-112` for the derived
buffers). Everything here is a pure function of static configuration: the
returned :class:`DiffusionSchedule` is a frozen pytree of fp32 arrays that is
closed over by jitted training / sampling programs, so the coefficients are
baked into the compiled executable exactly once (the reference recomputes and
re-registers them every time a model object is constructed).

All schedule math is done in float64 on host (numpy) and cast to float32 at
the end: the reference's "exponential" schedule ends at beta=1.0, which drives
``alphas_cumprod`` to ~0 and makes ``sqrt(1/alphas_cumprod)`` explode; doing
the cumprod in fp64 and flooring at a tiny epsilon keeps the fp32 tables
finite while preserving the clamp-to-sign behaviour of the final denoising
step.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

__all__ = [
    "DiffusionSchedule",
    "linear_beta_schedule",
    "quadratic_beta_schedule",
    "sigmoid_beta_schedule",
    "cosine_beta_schedule",
    "exponential_beta_schedule",
    "constant_fraction_beta_schedule",
    "variance_preserving_beta_schedule",
    "BETA_SCHEDULES",
    "make_schedule",
]

# Floor for alphas_cumprod. The reference (fp32 torch) lets alphas_cumprod
# reach ~1e-11 at the last exponential-schedule step; flooring here keeps
# 1/sqrt(alphas_cumprod) finite without changing the effective behaviour
# (x0-hat is clamped to [-1, 1] right after it is formed).
_ALPHAS_CUMPROD_FLOOR = 1e-12


def linear_beta_schedule(n_steps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    """Linear schedule (reference `helpers.py:13`)."""
    return np.linspace(beta_start, beta_end, n_steps, dtype=np.float64)


def quadratic_beta_schedule(n_steps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    """Quadratic schedule (reference `helpers.py:17`)."""
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, n_steps, dtype=np.float64) ** 2


def sigmoid_beta_schedule(n_steps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    """Sigmoid schedule (reference `helpers.py:21`)."""
    x = np.linspace(-6.0, 6.0, n_steps, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start


def cosine_beta_schedule(n_steps: int, s: float = 0.008, a_min: float = 0.0, a_max: float = 0.999) -> np.ndarray:
    """Cosine schedule of Nichol & Dhariwal (reference `helpers.py:26-37`)."""
    steps = n_steps + 1
    x = np.linspace(0, steps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, a_min, a_max)


def exponential_beta_schedule(n_steps: int, beta_start: float = 1e-4, beta_end: float = 1.0) -> np.ndarray:
    """Exponentially increasing betas; the production schedule of the
    reference's cart-pole / Panda models (reference `helpers.py:40-46`,
    selected at `diffusion_model_base.py:75-76`).

    Mirrors the reference exactly, including the quirk that the grid is
    ``linspace(0, n, n)`` (so the exponent reaches ``n`` and the final beta
    equals ``beta_end``).
    """
    x = np.linspace(0, n_steps, n_steps, dtype=np.float64)
    a = (1.0 / n_steps) * np.log(beta_end / beta_start)
    return beta_start * np.exp(a * x)


def constant_fraction_beta_schedule(n_steps: int) -> np.ndarray:
    """beta_t = 1/(T - t + 1) (reference `helpers.py:49-52`)."""
    x = np.linspace(0, n_steps, n_steps, dtype=np.float64)
    return 1.0 / (n_steps - x + 1.0)


def variance_preserving_beta_schedule(n_steps: int, beta_start: float = 1e-4, beta_end: float = 1.0) -> np.ndarray:
    """Variance-preserving schedule (reference `helpers.py:55-62`)."""
    x = np.linspace(0, n_steps, n_steps, dtype=np.float64)
    alphas = np.exp(
        -beta_start * (1.0 / n_steps)
        - 0.5 * (beta_end - beta_start) * (2.0 * x - 1.0) / (n_steps ** 2)
    )
    return 1.0 - alphas


BETA_SCHEDULES: Dict[str, Callable[..., np.ndarray]] = {
    "linear": linear_beta_schedule,
    "quadratic": quadratic_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
    "cosine": cosine_beta_schedule,
    "exponential": exponential_beta_schedule,
    "constant_fraction": constant_fraction_beta_schedule,
    "variance_preserving": variance_preserving_beta_schedule,
}


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM coefficient tables, one fp32 vector of length T each.

    Field-for-field equivalent of the registered buffers at reference
    `diffusion_model_base.py:87-109`. Treated as a static constant by jitted
    programs (arrays are closed over, not traced arguments).
    """

    n_steps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    def extract(self, table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """Gather ``table[t]`` and broadcast to an ``ndim``-rank batch shape.

        Equivalent of reference `sample_functions.py:11-14` (`extract`):
        ``t`` has shape (batch,), result has shape (batch, 1, ..., 1).
        """
        out = jnp.take(table, t, axis=0)
        return out.reshape(out.shape + (1,) * (ndim - 1))


def make_schedule(name: str, n_steps: int, **kwargs) -> DiffusionSchedule:
    """Build the full coefficient table set for a named beta schedule.

    Mirrors reference `diffusion_model_base.py:73-109`.
    """
    if name not in BETA_SCHEDULES:
        raise ValueError(f"unknown beta schedule '{name}'; have {sorted(BETA_SCHEDULES)}")
    betas = np.asarray(BETA_SCHEDULES[name](n_steps, **kwargs), dtype=np.float64)
    # The exponential schedule ends at beta_end=1.0 and fp64 rounding can land
    # a hair above it; clamp so alpha >= 0 (sqrt(alpha) would be NaN).
    alphas = np.maximum(1.0 - betas, 0.0)
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod = np.maximum(alphas_cumprod, _ALPHAS_CUMPROD_FLOOR)
    alphas_cumprod_prev = np.concatenate([np.ones(1), alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        n_steps=n_steps,
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
    )
