"""Per-kernel microbenchmarks: every Pallas kernel vs its XLA twin, on-device.

Round-1 kernel: the fused conv block (`ops.fused_conv1d_gn_mish`).
Round-2 kernels (the ones the headline rides on — VERDICT r2 #5):
- fused U-Net forward (`ops.fused_unet.make_fused_unet`) vs `model.apply`,
- whole CFG DDPM chain (`ops.fused_denoise.make_fused_cfg_chain`) vs
  `GaussianDiffusion.ddpm_cfg_sample`,
- distilled DDIM chain (`ops.fused_denoise.make_fused_ddim_chain`) vs the
  XLA student sampler (`diffusion.distillation.make_student_ddim_sampler`),
- whole CFG episode (`ops.fused_episode.make_fused_cfg_episode`) vs the
  XLA fused loop (`control.make_closed_loop`).

Each at the flagship shape (H=32, 1ch, ctx 5) and the panda shape
(H=128, 7ch, ctx 20 — the VMEM-stressing config; kernels that exceed the
budget report the error instead of a number). Numerics are checked against
the XLA twin on every row. Timing is pipelined (async dispatch batch, one
sync) per BENCH.md's protocol note. One JSON line per row.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _pipelined_us(fn, args_list, n_batches=3):
    """Shared pipelined best-of-batches protocol (eval.timing), in us."""
    from mpc_via_diffusion_model_tpu.eval.timing import pipelined_time_fn
    return pipelined_time_fn(fn, args_list, n_batches) * 1e6


def _maxerr(a, b):
    return float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b))))


def bench_conv_blocks():
    from mpc_via_diffusion_model_tpu.ops import (
        conv1d_gn_mish_reference, fused_conv1d_gn_mish,
    )

    on_tpu = jax.default_backend() == "tpu"
    shapes = [(2, 32, 1, 32), (2, 32, 32, 32), (2, 16, 32, 64), (2, 8, 64, 128),
              (64, 32, 32, 32), (64, 8, 64, 128)]
    for bsz, h, cin, cout in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (bsz, h, cin))
        w = jax.random.normal(jax.random.PRNGKey(1), (5, cin, cout)) * 0.1
        b = jnp.zeros((cout,))
        gamma, beta = jnp.ones((cout,)), jnp.zeros((cout,))
        groups = 8 if cout % 8 == 0 else 1
        ref = jax.jit(lambda x: conv1d_gn_mish_reference(x, w, b, gamma, beta, groups))
        argsl = [(x,)] * 30
        t_ref = _pipelined_us(ref, argsl)
        if on_tpu:
            fused = jax.jit(lambda x: fused_conv1d_gn_mish(x, w, b, gamma, beta, groups))
            err = _maxerr(fused(x), ref(x))
            t_fused = _pipelined_us(fused, argsl)
        else:
            err, t_fused = 0.0, None
        print(json.dumps({"kernel": "conv1d_gn_mish", "shape": [bsz, h, cin, cout],
                          "xla_us": round(t_ref, 1),
                          "pallas_us": round(t_fused, 1) if t_fused else None,
                          "max_abs_err": err}), flush=True)


def bench_round2(tag, horizon, channels, ctx_dim, plant, cost, x0, to_cond=None,
                 episode_ok=True):
    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.ops.fused_denoise import (
        make_fused_cfg_chain, make_fused_ddim_chain,
    )
    from mpc_via_diffusion_model_tpu.ops.fused_episode import make_fused_cfg_episode
    from mpc_via_diffusion_model_tpu.ops.fused_unet import make_fused_unet

    on_tpu = jax.default_backend() == "tpu"
    model = TemporalUnet(state_dim=channels, n_support_points=horizon,
                         unet_input_dim=32, dim_mults=UNET_DIM_MULTS[0],
                         context_dim=ctx_dim, conditioning_type="default")
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, horizon, channels)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2, ctx_dim)),
                        jnp.zeros((2, 1)))
    key = jax.random.PRNGKey(7)
    rows = 2 * horizon  # CFG doubled batch stacked into kernel rows

    def row(name, xla_us, pallas_us, err, extra=None):
        print(json.dumps({"kernel": name, "config": tag, "rows": rows,
                          "xla_us": round(xla_us, 1) if xla_us else None,
                          "pallas_us": round(pallas_us, 1) if pallas_us else None,
                          "max_abs_err": err, **(extra or {})}), flush=True)

    # ---- fused U-Net forward (batch 2 = the CFG pair) ----
    x = jax.random.normal(key, (2, horizon, channels)) * 0.3
    t = jnp.asarray([5, 5], jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, ctx_dim)) * 0.3
    mask = jnp.asarray([[0.0], [1.0]])
    xla_fwd = jax.jit(lambda x, t, c, m: model.apply(params, x, t, c, m))
    argsl = [(x, t, ctx, mask)] * 30
    t_x = _pipelined_us(xla_fwd, argsl)
    if on_tpu:
        try:
            fused = jax.jit(make_fused_unet(model, params, batch_size=2))
            err = _maxerr(fused(x, t, ctx, mask), xla_fwd(x, t, ctx, mask))
            t_p = _pipelined_us(fused, argsl)
            row("unet_forward", t_x, t_p, err)
        except Exception as e:  # noqa: BLE001
            row("unet_forward", t_x, None, None,
                {"error": f"{type(e).__name__}: {str(e)[:200]}"})
    else:
        row("unet_forward", t_x, None, None)

    # ---- whole CFG DDPM chain (25+5 steps, 2 U-Net evals/step) ----
    cond = ctx[:1]
    xla_chain = jax.jit(lambda c, k: diffusion.ddpm_cfg_sample(
        lambda xx, tt, cc, mm: model.apply(params, xx, tt, cc, mm),
        (1, horizon, channels), k, c, w=0.01, n_diffusion_steps_without_noise=5))
    argsc = [(cond, jax.random.fold_in(key, i)) for i in range(20)]
    t_x = _pipelined_us(xla_chain, argsc)
    if on_tpu:
        try:
            chain = jax.jit(make_fused_cfg_chain(
                model, params, schedule, n_samples=1, w=0.01,
                n_diffusion_steps_without_noise=5))
            err = _maxerr(chain(cond, argsc[0][1]), xla_chain(cond, argsc[0][1]))
            t_p = _pipelined_us(chain, argsc)
            row("cfg_chain_30step", t_x, t_p, err)
        except Exception as e:  # noqa: BLE001
            row("cfg_chain_30step", t_x, None, None,
                {"error": f"{type(e).__name__}: {str(e)[:200]}"})
    else:
        row("cfg_chain_30step", t_x, None, None)

    # ---- distilled 3-eval DDIM chain ----
    times = [23, 15, 7]
    xla_student = make_student_ddim_sampler(schedule, model.apply, times)
    xla_ddim = jax.jit(lambda c, k: xla_student(params, c, k, (1, horizon, channels)))
    t_x = _pipelined_us(xla_ddim, argsc)
    if on_tpu:
        try:
            ddim = jax.jit(make_fused_ddim_chain(model, params, schedule, times,
                                                 n_samples=1))
            err = _maxerr(ddim(cond, argsc[0][1]), xla_ddim(cond, argsc[0][1]))
            t_p = _pipelined_us(ddim, argsc)
            row("ddim_chain_3eval", t_x, t_p, err)
        except Exception as e:  # noqa: BLE001
            row("ddim_chain_3eval", t_x, None, None,
                {"error": f"{type(e).__name__}: {str(e)[:200]}"})
    else:
        row("ddim_chain_3eval", t_x, None, None)

    # ---- whole CFG episode (80 control steps) ----
    # episode_ok=False: the plant step does not lower to Mosaic (panda RNE —
    # see ops/fused_episode.py plant envelope note); the attempted compile
    # can wedge the axon relay, so it is skipped rather than tried.
    in_stats = NormalizerStats("limits", mins=jnp.full((channels,), -30.0),
                               maxs=jnp.full((channels,), 30.0))
    c_stats = NormalizerStats("limits", mins=jnp.full((ctx_dim,), -10.0),
                              maxs=jnp.full((ctx_dim,), 10.0))
    n_steps = 80
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, w=0.01,
        n_diffusion_steps_without_noise=5, state_to_condition=to_cond))
    argse = [(params, x0, jax.random.fold_in(key, 100 + i)) for i in range(8)]
    xla_ep = lambda pp, xx, kk: loop(pp, xx, kk).x_track
    t_x = _pipelined_us(xla_ep, argse)
    if on_tpu and episode_ok:
        try:
            ep = jax.jit(make_fused_cfg_episode(
                model, params, schedule, in_stats, c_stats, plant, cost,
                n_steps=n_steps, w=0.01, n_diffusion_steps_without_noise=5,
                state_to_condition=to_cond))
            jax.block_until_ready(ep(x0, key))
            t_p = _pipelined_us(ep, [(xx, kk) for _, xx, kk in argse])
            row("cfg_episode_80step", t_x, t_p, None,
                {"note": "episode semantics validated in tests/test_fused_episode.py"})
        except Exception as e:  # noqa: BLE001
            row("cfg_episode_80step", t_x, None, None,
                {"error": f"{type(e).__name__}: {str(e)[:200]}"})
    elif on_tpu:
        row("cfg_episode_80step", t_x, None, None,
            {"note": "episode kernel skipped: plant step not Mosaic-lowerable "
                     "(use fused chain + XLA loop)"})
    else:
        row("cfg_episode_80step", t_x, None, None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip-conv", action="store_true")
    p.add_argument("--skip-panda", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_cost, cartpole_virtual_swingup, get_plant,
        make_panda_context, theta_to_red_theta,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    if not args.skip_conv:
        bench_conv_blocks()

    plant, cost = cartpole_virtual_swingup(), cartpole_virtual_cost()
    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
    bench_round2("flagship_h32_1ch_ctx5", 32, 1, 5, plant, cost, x0)

    if not args.skip_panda:
        pplant, pcost = get_plant("panda")
        px0 = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])
        bench_round2("panda_h128_7ch_ctx20", 128, 7, 20, pplant, pcost, px0,
                     to_cond=make_panda_context(), episode_ok=False)


if __name__ == "__main__":
    main()
