"""The reference's exact LMPC closed-loop evaluation protocol, shared by the
parity flagship and the study sweeps.

Mirrors `Condition_Weight_Inference.py:174-262` / the committed
`model_performance_saving/model_230000` runs: 50 receding-horizon steps at
horizon 8; each step CFG-samples a u-horizon (T=25 DDPM + 5 noise-free),
applies ``round(u[0], 4)``, and advances the EXACT ZoH-discretized linear
cart-pole in fp64 on host. The guidance weight is a traced argument so a w
sweep reuses one compiled program.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.normalization import NormalizerStats, normalize, unnormalize

__all__ = ["make_lmpc_eval", "LMPC_Q", "LMPC_P"]

LMPC_Q = np.diag([10.0, 1.0, 10.0, 1.0])
LMPC_P = np.diag([100.0, 1.0, 100.0, 1.0])


def make_lmpc_eval(
    diffusion,
    apply_fn: Callable,
    inputs_stats: NormalizerStats,
    condition_stats: NormalizerStats,
    a_d: np.ndarray,
    b_d: np.ndarray,
    horizon: int = 8,
    n_steps: int = 50,
    n_diffusion_steps_without_noise: int = 5,
):
    """Build ``evaluate(params, x0, w, seed, n_cand=1) -> us (n_steps,)``.

    One jitted sampler (w traced) serves every weight in a sweep; the plant
    rollout and min-cost candidate selection run in fp64 on host exactly as
    the reference does (`Condition_Weight_Inference.py:242-262`)."""

    def sample(params, ctx_norm, key, w, n_cand):
        ctx = jnp.broadcast_to(ctx_norm[None, :], (n_cand, ctx_norm.shape[0]))
        dn = lambda x, t, c, m: apply_fn(params, x, t, c, m)
        return diffusion.ddpm_cfg_sample(
            dn, (n_cand, horizon, 1), key, ctx, w=w,
            n_diffusion_steps_without_noise=n_diffusion_steps_without_noise,
        )

    sample_j = jax.jit(sample, static_argnums=(4,))

    def evaluate(params, x0: np.ndarray, w: float, seed: int, n_cand: int = 1):
        x = np.asarray(x0, np.float64).copy()
        key = jax.random.PRNGKey(seed)
        us = []
        w_arr = jnp.float32(w)
        for _ in range(n_steps):
            ctx_norm = normalize(condition_stats, jnp.asarray(x, jnp.float32))
            key, k = jax.random.split(key)
            u_norm = sample_j(params, ctx_norm, k, w_arr, n_cand)
            u_cand = np.asarray(unnormalize(inputs_stats, u_norm))[..., 0]
            if n_cand > 1:
                best, best_j = 0, np.inf
                for c in range(n_cand):
                    xx, jj = x.copy(), 0.0
                    for t in range(horizon):
                        jj += xx @ LMPC_Q @ xx + u_cand[c, t] ** 2
                        xx = a_d @ xx + b_d[:, 0] * u_cand[c, t]
                    jj += xx @ LMPC_P @ xx
                    if jj < best_j:
                        best, best_j = c, jj
                u_row = u_cand[best]
            else:
                u_row = u_cand[0]
            applied = round(float(u_row[0]), 4)
            us.append(applied)
            x = a_d @ x + b_d[:, 0] * applied
        return np.asarray(us)

    return evaluate
