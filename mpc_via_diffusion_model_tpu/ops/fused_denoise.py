"""The ENTIRE CFG denoising chain as ONE Pallas TPU kernel.

Round-1 fused the U-Net forward into a single kernel (`fused_unet.py`) but
still launched it 30 times per replan from a `lax.scan` (25 DDPM steps + 5
noise-free tail, reference `cart_pole_sample_loop`,
`diffusion_model_base.py:181-209`). This kernel keeps the state x resident
in VMEM across ALL steps and runs the per-step posterior update in-kernel,
eliminating every per-launch overhead and intermediate HBM round-trip:

- FiLM biases depend only on (timestep, context) — both known before the
  chain starts — so all n_steps x n_res FiLM vectors are precomputed
  XLA-side in one stacked einsum and passed in (tiny: 30 x 12 x 2B x 128).
- The injected noise for every step is pre-drawn (one `normal()`), matching
  `ddpm_cfg_sample`'s single-PRNG-op semantics exactly.
- Schedule coefficients are STATIC per step (the time grid is fixed), so the
  posterior update x <- c1(t) clip(recon) + c2(t) x + sigma(t) gate noise
  bakes its scalars into the instruction stream; the CFG combination of x0
  reconstructions ((1+w) cond - w uncond, reference
  `p_mean_variance_CFG:164-178`) happens on rows already in VMEM.
- The denoise loop itself is a `lax.fori_loop` over steps: the U-Net body is
  traced ONCE (same Mosaic program size as the single-forward kernel), and
  per-step scalars are gathered from small VMEM tables.

Weights can be stored bf16 (`weights_dtype=jnp.bfloat16`): half the VMEM
footprint, MXU computes bf16 x bf16 -> fp32. Activations and the posterior
update stay fp32.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.schedules import DiffusionSchedule
from ..models.layers import mish
from ..models.temporal_unet import TemporalUnet
from .fused_unet import (append_final_1x1, build_unet_ops,
                         stack_film_weights, time_embedding_table)

__all__ = ["make_fused_cfg_chain", "make_fused_ddim_chain"]


def make_fused_cfg_chain(
    model: TemporalUnet,
    params,
    schedule: DiffusionSchedule,
    n_samples: int = 1,
    w: float = 0.01,
    n_diffusion_steps_without_noise: int = 5,
    clip_denoised: bool = True,
    weights_dtype=jnp.float32,
    interpret: bool = False,
) -> Callable:
    """Build ``sample(context, key) -> u_norm (n_samples, horizon, out_dim)``
    running the full CFG DDPM chain in one pallas_call. Semantics match
    `GaussianDiffusion.ddpm_cfg_sample` exactly (same noise layout, t<0
    clamp, noise-zero at i<=0, x0-recon CFG combination, clip)."""
    b2 = 2 * n_samples  # CFG doubled batch
    ops = build_unet_ops(model, params, b2, weights_dtype)
    flat, body = ops["flat"], ops["body"]
    films_w, f1_w, time_p = ops["films_w"], ops["final_1x1"], ops["time"]
    horizon, n_res, max_c = ops["horizon"], ops["n_res"], ops["max_c"]
    out_dim = ops["out_dim"]
    d_state = model.state_dim

    n_tail = n_diffusion_steps_without_noise
    n_total = schedule.n_steps + n_tail
    steps = np.arange(schedule.n_steps - 1, -n_tail - 1, -1)  # i values
    t_eff = np.maximum(steps, 0)

    s = schedule
    tab = lambda a: np.asarray(a, np.float64)
    sra = tab(s.sqrt_recip_alphas_cumprod)[t_eff]
    srm = tab(s.sqrt_recipm1_alphas_cumprod)[t_eff]
    c1 = tab(s.posterior_mean_coef1)[t_eff]
    c2 = tab(s.posterior_mean_coef2)[t_eff]
    sig = np.exp(0.5 * tab(s.posterior_log_variance_clipped)[t_eff])
    gate = (steps > 0).astype(np.float64)
    # per-step scalar table, gathered from VMEM inside the fori_loop body
    coefs = jnp.asarray(
        np.stack([sra, srm, c1, c2, sig * gate], axis=1), jnp.float32
    )  # (n_total, 5)

    # precompute the time embeddings of every step ONCE at build time
    t_embs = time_embedding_table(time_p, t_eff)
    wf_stack, bf_stack = stack_film_weights(films_w, max_c)

    def kernel(films_ref, noise_ref, coef_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]

        def W(idx):
            return wrefs[idx][...]

        rows = n_samples * horizon

        def step_body(si, x):
            # x: (rows, d_state) fp32 rows of the current sample
            films = films_ref[si]  # (n_res, 2B, max_c)
            x2 = jnp.concatenate([x, x], axis=0)  # (2*rows, d)
            y = body(W, films, x2)  # (2*rows, unet_dim)
            eps2 = jnp.dot(y.astype(weights_dtype), W(w1_idx),
                           preferred_element_type=jnp.float32) + W(b1_idx)
            # per-step scalars: SMEM loads must be scalar-at-a-time
            sra_t = coef_ref[si, 0]
            srm_t = coef_ref[si, 1]
            c1_t = coef_ref[si, 2]
            c2_t = coef_ref[si, 3]
            sg_t = coef_ref[si, 4]
            recon2 = sra_t * x2 - srm_t * eps2
            recon = (1.0 + w) * recon2[:rows] - w * recon2[rows:]
            if clip_denoised:
                recon = jnp.clip(recon, -1.0, 1.0)
            mean = c1_t * recon + c2_t * x
            nz = noise_ref[si].reshape(rows, d_state)
            return mean + sg_t * nz

        x0 = noise_ref[n_total].reshape(rows, d_state)
        x = jax.lax.fori_loop(0, n_total, step_body, x0)
        out_ref[...] = x.reshape(n_samples, horizon, d_state)

    # append the final-1x1 weights to the flat list
    flat = list(flat)
    w1_idx, b1_idx = append_final_1x1(flat, f1_w, weights_dtype)

    def sample(context: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """context: (n_samples, cond_dim) normalized conditioning."""
        # CFG doubled context: rows [0,B) present, [B,2B) dropped (zeroed)
        ctx2 = jnp.concatenate([context, jnp.zeros_like(context)], axis=0)
        parts = [jnp.broadcast_to(t_embs[:, None, :], (n_total, b2, t_embs.shape[-1])),
                 jnp.broadcast_to(ctx2[None], (n_total, b2, ctx2.shape[-1]))]
        if getattr(model, "cfg_indicator", False):
            present = jnp.concatenate(
                [jnp.ones((n_samples, 1)), jnp.zeros((n_samples, 1))], axis=0)
            parts.append(jnp.broadcast_to(present[None], (n_total, b2, 1)))
        c_emb = jnp.concatenate(parts, axis=-1)  # (n_total, 2B, cond)
        mc = mish(c_emb)
        films = jnp.einsum("sbc,rcd->srbd", mc, wf_stack) + bf_stack[None, :, None, :]
        # (n_total, n_res, 2B, max_c)

        noise = jax.random.normal(
            key, (n_total + 1, n_samples, horizon, d_state), jnp.float32)
        # match ddpm_cfg_sample's layout: noise[0] is x_T, noise[1:] injected
        noise_tab = jnp.concatenate([noise[1:], noise[:1]], axis=0)

        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            in_specs=[full(), full(),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]  # per-step scalars
                     + [full()] * len(flat),
            out_specs=full(),
            out_shape=jax.ShapeDtypeStruct((n_samples, horizon, d_state), jnp.float32),
            interpret=interpret,
        )(films, noise_tab, coefs, *flat)

    return sample


def make_fused_ddim_chain(
    model: TemporalUnet,
    params,
    schedule: DiffusionSchedule,
    times,
    n_samples: int = 1,
    weights_dtype=jnp.float32,
    clip_denoised: bool = True,
    interpret: bool = False,
) -> Callable:
    """The distilled/conditional DDIM chain as ONE Pallas kernel.

    Runs `diffusion.distillation.make_student_ddim_sampler`'s affine update
    ``x <- c1(t) clip(recon) + c2(t) x`` over the static ``times`` grid with
    NO CFG doubling (the guidance weight is baked into the distilled student)
    and no injected noise — the whole few-step sampler is len(times)+1
    sequential U-Net bodies inside one `lax.fori_loop`. Semantics match the
    XLA sampler to fp tolerance (tests/test_distillation.py).
    """
    from ..diffusion.distillation import ddim_affine_coefs

    ops = build_unet_ops(model, params, n_samples, weights_dtype)
    flat, body = ops["flat"], ops["body"]
    films_w, f1_w, time_p = ops["films_w"], ops["final_1x1"], ops["time"]
    horizon, n_res, max_c = ops["horizon"], ops["n_res"], ops["max_c"]
    d_state = model.state_dim

    C = ddim_affine_coefs(schedule, times)
    n_total = len(C["t"])
    coefs = jnp.asarray(
        np.stack([C["sra"], C["srm"], C["c1"], C["c2"]], axis=1), jnp.float32
    )  # (n_total, 4)

    # time embeddings of the grid steps, precomputed at build time
    t_embs = time_embedding_table(time_p, C["t"])
    wf_stack, bf_stack = stack_film_weights(films_w, max_c)

    def kernel(films_ref, noise_ref, coef_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]

        def W(idx):
            return wrefs[idx][...]

        rows = n_samples * horizon

        def step_body(si, x):
            films = films_ref[si]  # (n_res, B, max_c)
            y = body(W, films, x)
            eps = jnp.dot(y.astype(weights_dtype), W(w1_idx),
                          preferred_element_type=jnp.float32) + W(b1_idx)
            sra_t = coef_ref[si, 0]
            srm_t = coef_ref[si, 1]
            c1_t = coef_ref[si, 2]
            c2_t = coef_ref[si, 3]
            recon = sra_t * x - srm_t * eps
            if clip_denoised:
                recon = jnp.clip(recon, -1.0, 1.0)
            return c1_t * recon + c2_t * x

        x = jax.lax.fori_loop(0, n_total, step_body, noise_ref[...].reshape(rows, d_state))
        out_ref[...] = x.reshape(n_samples, horizon, d_state)

    flat = list(flat)
    w1_idx, b1_idx = append_final_1x1(flat, f1_w, weights_dtype)

    def sample(context: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """context: (n_samples, cond_dim) normalized conditioning."""
        parts = [jnp.broadcast_to(t_embs[:, None, :], (n_total, n_samples, t_embs.shape[-1])),
                 jnp.broadcast_to(context[None], (n_total, n_samples, context.shape[-1]))]
        if getattr(model, "cfg_indicator", False):
            parts.append(jnp.ones((n_total, n_samples, 1)))
        c_emb = jnp.concatenate(parts, axis=-1)
        mc = mish(c_emb)
        films = jnp.einsum("sbc,rcd->srbd", mc, wf_stack) + bf_stack[None, :, None, :]

        x_init = jax.random.normal(key, (n_samples, horizon, d_state), jnp.float32)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            in_specs=[full(), full(),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
                     + [full()] * len(flat),
            out_specs=full(),
            out_shape=jax.ShapeDtypeStruct((n_samples, horizon, d_state), jnp.float32),
            interpret=interpret,
        )(films, x_init, coefs, *flat)

    return sample
