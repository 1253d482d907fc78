"""Gaussian diffusion (DDPM/DDIM) core: training losses and sampling loops.

TPU-native rebuild of `mpd/models/diffusion_models/diffusion_model_base.py`
and `sample_functions.py`. Design differences from the reference, all
deliberate:

- The model is passed in as a pure ``denoise_fn(x, t, context, context_mask)``
  closure (apply-bound flax params), so every public entry point is jittable
  and the denoising loop is a single ``lax.scan`` — the reference runs a
  Python loop with one (or two) CUDA launches per step and, in the control
  scripts, reloads + torch.compiles the model inside every replanning step
  (`Diffusion_MPC_Inference.py:199-227`).
- Classifier-free guidance does ONE batched forward over a doubled batch
  instead of two sequential forwards (`p_mean_variance_CFG`,
  `diffusion_model_base.py:164-178` runs the U-Net twice): rows [0, B) carry
  the context, rows [B, 2B) carry the dropped context. Identical math,
  2x better MXU utilisation at these tiny batch sizes.
- PRNG is explicit: every sampler takes a jax PRNG key (the reference uses
  the global torch seed).

Semantics preserved exactly (golden-tested against a numpy oracle):
- epsilon- or x0-prediction (`predict_start_from_noise`, reference `:127-138`)
- x0-hat clamped to [-1, 1] when ``clip_denoised`` (reference `:155-158`)
- CFG combines x0 RECONSTRUCTIONS, not epsilons:
  ``x0 = (1+w) x0_cond - w x0_uncond`` (reference `:170`)
- ``n_diffusion_steps_without_noise`` deterministic tail steps: t < 0 is
  clamped to t = 0 and the injected noise is zeroed for every tail step
  (reference `sample_functions.py:28-44`, loop at `:195`)
- training: t ~ U[0, T), context dropped i.i.d. Bernoulli(drop_prob)
  (reference `p_losses`, `:434-462`)
- DDIM with T//5 steps, eta=0 (reference `ddim_sample`, `:239-314`)
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import LOSSES
from ..core.schedules import DiffusionSchedule

__all__ = ["GaussianDiffusion", "HardConds", "apply_hard_conds"]

# Hard (inpainting) conditions: (timestep indices (K,), values (B, K, D)).
# Replaces the reference's dict {t: value} + per-step Python loop
# (`sample_functions.py:5-8`) with one scatter.
HardConds = Optional[Tuple[jnp.ndarray, jnp.ndarray]]

DenoiseFn = Callable[..., jnp.ndarray]
GuideFn = Callable[[jnp.ndarray], jnp.ndarray]


def apply_hard_conds(x: jnp.ndarray, hard_conds: HardConds) -> jnp.ndarray:
    """x[:, idx, :] = values (reference `apply_hard_conditioning`)."""
    if hard_conds is None:
        return x
    idx, values = hard_conds
    return x.at[:, idx, :].set(values)


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Static diffusion configuration + precomputed schedule tables.

    Mirrors the constructor options of the reference `GaussianDiffusionModel`
    (`diffusion_model_base.py:48-58`); ``w`` (the CFG weight) is a sampler
    argument here instead of mutable object state (reference `run_CFG`
    assigns ``self.w``, `:397`).
    """

    schedule: DiffusionSchedule
    predict_epsilon: bool = True
    clip_denoised: bool = True
    loss_type: str = "l2"
    drop_prob: float = 0.25

    # ------------------------------------------------------------------ #
    # shared math
    # ------------------------------------------------------------------ #
    def _extract(self, table, t, ndim):
        return self.schedule.extract(table, t, ndim)

    def predict_start_from_noise(self, x_t, t, model_out):
        """reference `diffusion_model_base.py:127-138`."""
        if self.predict_epsilon:
            s = self.schedule
            return (
                self._extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                - self._extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * model_out
            )
        return model_out

    def predict_noise_from_start(self, x_t, t, x0):
        """reference `diffusion_model_base.py:115-125`."""
        if self.predict_epsilon:
            return x0  # model output already is epsilon
        s = self.schedule
        return (
            self._extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / self._extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def q_posterior(self, x_start, x_t, t):
        """reference `diffusion_model_base.py:140-147`."""
        s = self.schedule
        mean = (
            self._extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + self._extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        log_var = self._extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, log_var

    def _clip_recon(self, x_recon):
        if self.clip_denoised:
            return jnp.clip(x_recon, -1.0, 1.0)
        return x_recon

    def p_mean_variance(self, denoise_fn, x, t, context):
        """Single-pass posterior parameters (reference `:149-161`)."""
        x_recon = self._clip_recon(
            self.predict_start_from_noise(x, t, denoise_fn(x, t, context, None))
        )
        return self.q_posterior(x_recon, x, t)

    def p_mean_variance_cfg(self, denoise_fn, x, t, context, w):
        """CFG posterior parameters (reference `:164-178`), with the two
        U-Net evaluations fused into one doubled-batch forward."""
        b = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        ctx2 = jnp.concatenate([context, context], axis=0)
        mask2 = jnp.concatenate(
            [jnp.zeros((b, 1), x.dtype), jnp.ones((b, 1), x.dtype)], axis=0
        )
        out2 = denoise_fn(x2, t2, ctx2, mask2)
        recon2 = self.predict_start_from_noise(x2, t2, out2)
        recon_cond, recon_uncond = recon2[:b], recon2[b:]
        x_recon = self._clip_recon((1.0 + w) * recon_cond - w * recon_uncond)
        return self.q_posterior(x_recon, x, t)

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #
    def q_sample(self, x_start, t, noise):
        """Forward noising (reference `:423-432`)."""
        s = self.schedule
        return (
            self._extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + self._extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def loss(
        self,
        denoise_fn: DenoiseFn,
        x_start: jnp.ndarray,
        context: Optional[jnp.ndarray],
        key: jax.Array,
        hard_conds: HardConds = None,
        sample_keys: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Training loss (reference `loss` + `p_losses`, `:434-467`):
        random t, q_sample, Bernoulli(drop_prob) context mask, weighted
        l2/l1 on epsilon (or x0).

        ``sample_keys`` (batch of per-sample PRNG keys) switches all draws to
        per-sample derivation, making the loss independent of how the batch
        is sharded — the DP train step derives them from GLOBAL sample
        indices so an 8-device mesh reproduces the 1-device update exactly
        (up to fp reduction order)."""
        b = x_start.shape[0]
        if sample_keys is not None:
            def draws(k):
                k_t, k_noise, k_mask = jax.random.split(k, 3)
                t1 = jax.random.randint(k_t, (), 0, self.schedule.n_steps)
                n1 = jax.random.normal(k_noise, x_start.shape[1:], x_start.dtype)
                m1 = jax.random.bernoulli(k_mask, self.drop_prob, (1,))
                return t1, n1, m1
            t, noise, mask_b = jax.vmap(draws)(sample_keys)
        else:
            k_t, k_noise, k_mask = jax.random.split(key, 3)
            t = jax.random.randint(k_t, (b,), 0, self.schedule.n_steps)
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
            mask_b = jax.random.bernoulli(k_mask, self.drop_prob, (b, 1))
        x_noisy = self.q_sample(x_start, t, noise)

        context_mask = None
        if context is not None:
            context_mask = mask_b.astype(x_start.dtype)

        x_recon = denoise_fn(x_noisy, t, context, context_mask)
        target = noise if self.predict_epsilon else x_start
        return LOSSES[self.loss_type](x_recon, target)

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #
    def ddpm_cfg_step(
        self,
        denoise_fn,
        x,
        i,
        noise,
        context,
        w,
        guide: Optional[GuideFn] = None,
        n_guide_steps: int = 1,
        t_start_guide: float = float("inf"),
        scale_grad_by_std: bool = False,
    ):
        """One CFG denoising step with the injected noise passed explicitly
        (reference `ddpm_cart_pole_sample_fn`, `sample_functions.py:17-44`):
        t < 0 clamps to t = 0; noise is zeroed whenever i <= 0.

        The optional ``guide`` hook mirrors `ddpm_step`'s (reference
        `guided_sample_fn`, `sample_functions.py:47-92`) so cost-gradient
        guidance composes with classifier-free guidance — the pattern the
        quadrotor obstacle-avoidance flagship uses."""
        t_eff = jnp.maximum(i, 0)
        t = jnp.full((x.shape[0],), t_eff, dtype=jnp.int32)
        mean, log_var = self.p_mean_variance_cfg(denoise_fn, x, t, context, w)
        x_new = mean
        if guide is not None:
            model_var = jnp.exp(log_var)
            do_guide = (i < t_start_guide).astype(x_new.dtype)
            for _ in range(n_guide_steps):
                g = guide(x_new)
                if scale_grad_by_std:
                    g = model_var * g
                x_new = x_new + do_guide * g
        noise_gate = (i > 0).astype(mean.dtype)
        return x_new + jnp.exp(0.5 * log_var) * noise * noise_gate

    def ddpm_step(
        self,
        denoise_fn,
        x,
        i,
        noise,
        context=None,
        hard_conds: HardConds = None,
        guide: Optional[GuideFn] = None,
        n_guide_steps: int = 1,
        t_start_guide: float = float("inf"),
        scale_grad_by_std: bool = False,
        noise_std_extra_schedule_fn: Optional[Callable] = None,
    ):
        """One plain-DDPM denoising step (reference `ddpm_sample_fn`,
        `sample_functions.py:47-92`)."""
        t_eff = jnp.maximum(i, 0)
        t = jnp.full((x.shape[0],), t_eff, dtype=jnp.int32)
        mean, log_var = self.p_mean_variance(denoise_fn, x, t, context)
        x_new = mean

        if guide is not None:
            model_var = jnp.exp(log_var)
            do_guide = (i < t_start_guide).astype(x_new.dtype)
            for _ in range(n_guide_steps):
                g = guide(x_new)
                if scale_grad_by_std:
                    g = model_var * g
                x_new = x_new + do_guide * g
                x_new = apply_hard_conds(x_new, hard_conds)

        std = jnp.exp(0.5 * log_var)
        noise_std = 1.0
        if noise_std_extra_schedule_fn is not None:
            noise_std = noise_std_extra_schedule_fn(i)
        noise_gate = (i > 0).astype(x_new.dtype)
        x_new = x_new + std * noise * noise_std * noise_gate
        return apply_hard_conds(x_new, hard_conds)

    def ddpm_sample(
        self,
        denoise_fn: DenoiseFn,
        shape: Tuple[int, ...],
        key: jax.Array,
        context: Optional[jnp.ndarray] = None,
        hard_conds: HardConds = None,
        n_diffusion_steps_without_noise: int = 0,
        guide: Optional[GuideFn] = None,
        n_guide_steps: int = 1,
        t_start_guide: float = float("inf"),
        scale_grad_by_std: bool = False,
        noise_std_extra_schedule_fn: Optional[Callable] = None,
        return_chain: bool = False,
    ):
        """DDPM ancestral sampling as one lax.scan (reference `p_sample_loop`
        + `ddpm_sample_fn`, `diffusion_model_base.py:212-237`,
        `sample_functions.py:47-92`)."""
        n_tail = n_diffusion_steps_without_noise
        n_total = self.schedule.n_steps + n_tail
        steps = jnp.arange(self.schedule.n_steps - 1, -n_tail - 1, -1)

        all_noise = jax.random.normal(key, (n_total + 1,) + tuple(shape), jnp.float32)
        x_init = apply_hard_conds(all_noise[0], hard_conds)

        def body(x, inp):
            i, noise = inp
            x_new = self.ddpm_step(
                denoise_fn, x, i, noise, context, hard_conds,
                guide, n_guide_steps, t_start_guide, scale_grad_by_std,
                noise_std_extra_schedule_fn,
            )
            return x_new, x_new if return_chain else None

        x, chain = jax.lax.scan(body, x_init, (steps, all_noise[1:]))
        if return_chain:
            return x, jnp.concatenate([x_init[None], chain], axis=0)
        return x

    def ddpm_cfg_sample(
        self,
        denoise_fn: DenoiseFn,
        shape: Tuple[int, ...],
        key: jax.Array,
        context: jnp.ndarray,
        w: float = 0.01,
        n_diffusion_steps_without_noise: int = 0,
        return_chain: bool = False,
        guide: Optional[GuideFn] = None,
        n_guide_steps: int = 1,
        t_start_guide: float = float("inf"),
        scale_grad_by_std: bool = False,
    ):
        """Classifier-free-guidance DDPM sampling, the flagship control path
        (reference `cart_pole_sample_loop` + `ddpm_cart_pole_sample_fn` +
        `run_CFG`, `diffusion_model_base.py:181-209,394-418`,
        `sample_functions.py:17-44`). No hard conditions on this path,
        matching the reference. ``guide`` adds cost-gradient guidance on top
        of CFG (the MPD pattern, `inference_(mpd).py:254-298`)."""
        n_tail = n_diffusion_steps_without_noise
        n_total = self.schedule.n_steps + n_tail
        steps = jnp.arange(self.schedule.n_steps - 1, -n_tail - 1, -1)

        # one PRNG op for the whole chain (initial x + every step's noise)
        # instead of sequential splits inside the scan — measurably cheaper
        # at control-loop batch sizes.
        all_noise = jax.random.normal(key, (n_total + 1,) + tuple(shape), jnp.float32)
        x0 = all_noise[0]

        def body(x, inp):
            i, noise = inp
            x_new = self.ddpm_cfg_step(
                denoise_fn, x, i, noise, context, w,
                guide=guide, n_guide_steps=n_guide_steps,
                t_start_guide=t_start_guide, scale_grad_by_std=scale_grad_by_std,
            )
            return x_new, x_new if return_chain else None

        x, chain = jax.lax.scan(body, x0, (steps, all_noise[1:]))
        if return_chain:
            return x, jnp.concatenate([x0[None], chain], axis=0)
        return x

    def ddim_sample(
        self,
        denoise_fn: DenoiseFn,
        shape: Tuple[int, ...],
        key: jax.Array,
        context: Optional[jnp.ndarray] = None,
        hard_conds: HardConds = None,
        sampling_timesteps: Optional[int] = None,
        eta: float = 0.0,
        w: float = 0.0,
        guide: Optional[GuideFn] = None,
        n_guide_steps: int = 1,
        t_start_guide: float = float("inf"),
        return_chain: bool = False,
    ):
        """DDIM sampler (reference `ddim_sample`, `:239-314`): T//5 steps by
        default, eta = 0. The time grid is static so the pair loop unrolls
        into the jitted program.

        ``w`` > 0 enables classifier-free guidance (beyond the reference,
        whose DDIM is unguided): one doubled-batch forward per step, x0
        reconstructions combined as ``(1+w) x0_cond - w x0_uncond`` (the same
        convention as `p_mean_variance_cfg`), then the predicted noise is
        re-derived from the guided x0 so the DDIM update stays consistent.
        ``w = 0`` is exactly the reference's unguided conditional pass."""
        import numpy as np

        total = self.schedule.n_steps
        n_sample_steps = sampling_timesteps or max(total // 5, 1)
        times = np.linspace(0, total - 1, n_sample_steps + 1)
        times = [-1] + [int(round(v)) for v in times]
        times = list(reversed(times))
        pairs = list(zip(times[:-1], times[1:]))

        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, shape, jnp.float32)
        x = apply_hard_conds(x, hard_conds)
        chain = [x] if return_chain else None

        b = shape[0]
        use_cfg = (w != 0.0) and (context is not None)
        for time, time_next in pairs:
            t = jnp.full((b,), time, dtype=jnp.int32)
            if use_cfg:
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                ctx2 = jnp.concatenate([context, context], axis=0)
                mask2 = jnp.concatenate(
                    [jnp.zeros((b, 1), x.dtype), jnp.ones((b, 1), x.dtype)], axis=0
                )
                recon2 = self.predict_start_from_noise(x2, t2, denoise_fn(x2, t2, ctx2, mask2))
                # no clip here: the unguided DDIM branch below never clips
                # x_start, so CFG must collapse to it exactly when the
                # denoiser ignores context (w-independence identity).
                x_start = (1.0 + w) * recon2[:b] - w * recon2[b:]
                # re-derive epsilon from the guided x0 (exact inversion of
                # predict_start_from_noise, NOT the predict_epsilon shortcut)
                s = self.schedule
                pred_noise = (
                    self._extract(s.sqrt_recip_alphas_cumprod, t, x.ndim) * x - x_start
                ) / self._extract(s.sqrt_recipm1_alphas_cumprod, t, x.ndim)
            else:
                model_out = denoise_fn(x, t, context, None)
                x_start = self.predict_start_from_noise(x, t, model_out)
                pred_noise = self.predict_noise_from_start(x, t, model_out)

            if time_next < 0:
                x = apply_hard_conds(x_start, hard_conds)
                if return_chain:
                    chain.append(x)
                break

            t_next = jnp.full((b,), time_next, dtype=jnp.int32)
            alpha = self._extract(self.schedule.alphas_cumprod, t, x.ndim)
            alpha_next = self._extract(self.schedule.alphas_cumprod, t_next, x.ndim)
            sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(1 - alpha_next - sigma ** 2)
            x = x_start * jnp.sqrt(alpha_next) + c * pred_noise

            if guide is not None and time_next < t_start_guide:
                for _ in range(n_guide_steps):
                    x = x + guide(x)
                    x = apply_hard_conds(x, hard_conds)

            k_loop, k_noise = jax.random.split(k_loop)
            x = x + sigma * jax.random.normal(k_noise, shape, jnp.float32)
            x = apply_hard_conds(x, hard_conds)
            if return_chain:
                chain.append(x)

        if return_chain:
            return x, jnp.stack(chain, axis=0)
        return x
