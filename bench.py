"""Headline benchmark: closed-loop diffusion-MPC control rate on cart-pole.

Measures the reference's flagship workload (BASELINE.md "Closed-loop workload
constants"): an 80-step receding-horizon loop where every step runs a full
CFG diffusion sampling (25 denoise steps + 5 noise-free tail, 2 U-Net
evaluations per step fused into one doubled batch) on the ~1M-param temporal
U-Net, horizon 32, then steps the nonlinear 5-state cart-pole plant — all
compiled into ONE jitted XLA program with zero host round-trips.

Metric: closed-loop control rate in Hz (replans per second of wall clock).
The reference's CPU/GPU loop pays per step: model reload + torch.compile
(`Diffusion_MPC_Inference.py:199-227`), 30 sequential double U-Net launches,
and host<->device transfers; its IPOPT baseline solves one NMPC per step on
CPU (~10-100 ms → ~10-100 Hz; vs_baseline is computed against a 100 Hz
generous estimate for the expert loop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# The reference's CPU closed-loop rate (IPOPT NMPC per step, CasADi overhead;
# generous upper estimate — see BASELINE.md "Per-step IPOPT MPC solve time").
BASELINE_CONTROL_HZ = 100.0

N_STEPS = 80
HORIZON = 32
N_DIFFUSION_STEPS = 25
N_TAIL = 5
CFG_W = 0.01


def main():
    import os
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_swingup,
        cartpole_virtual_cost,
        theta_to_red_theta,
    )
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS

    model = TemporalUnet(
        state_dim=1,
        n_support_points=HORIZON,
        unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0],
        context_dim=5,
        conditioning_type="default",
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", N_DIFFUSION_STEPS))
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()

    x = jnp.zeros((1, HORIZON, 1))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 5))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, jnp.zeros((1, 1)))

    # synthetic normalizer stats (bench measures compute, not model quality)
    inputs_stats = NormalizerStats(
        kind="limits", mins=jnp.full((1,), -30.0), maxs=jnp.full((1,), 30.0)
    )
    cond_stats = NormalizerStats(
        kind="limits", mins=jnp.full((5,), -10.0), maxs=jnp.full((5,), 10.0)
    )

    apply_fn = model.apply
    sample_override = None
    mode = os.environ.get("BENCH_FUSED", "episode")
    if mode == "episode":
        # round-2 default: the ENTIRE closed loop (80 replans x 30-step CFG
        # chain x plant step) as ONE Pallas kernel — weights staged into VMEM
        # once per episode (validated vs the per-replan path in
        # tests/test_fused_episode.py).
        from mpc_via_diffusion_model_tpu.ops.fused_episode import make_fused_cfg_episode

        wd = jnp.bfloat16 if os.environ.get("BENCH_BF16", "0") == "1" else jnp.float32
        episode = jax.jit(make_fused_cfg_episode(
            model, params, diffusion.schedule, inputs_stats, cond_stats,
            plant, cost, n_steps=N_STEPS, w=CFG_W,
            n_diffusion_steps_without_noise=N_TAIL, weights_dtype=wd,
        ))
        x0_e = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
        key = jax.random.PRNGKey(42)
        jax.block_until_ready(episode(x0_e, key))
        # best of 3 pipelined batches: the relay's dispatch pipelining is
        # stateful and occasionally degrades to one RTT per call; the fastest
        # batch reflects the device's actual episode throughput
        n_rep = 10
        dts = []
        for b in range(3):
            t0 = time.perf_counter()
            outs = [episode(x0_e, jax.random.fold_in(key, 100 * b + i))
                    for i in range(n_rep)]
            jax.block_until_ready(outs)
            dts.append((time.perf_counter() - t0) / n_rep)
        pipelined_hz = N_STEPS / min(dts)

        # sustained variant: a DEPENDENT chain of episodes — each dispatch's
        # x0 is the previous episode's final state, so the whole 800-step run
        # stays on device with ONE final sync. Robust to the relay's
        # pipelining state (the data dependence serializes device-side, the
        # client issues everything up front) and reuses the already-compiled
        # 80-step kernel (a single 800-step kernel would need a
        # 24,800-draw noise input whose minor-dim lane padding overflows
        # VMEM — measured). The HEADLINE value is this sustained rate; the
        # pipelined best-of rides along for continuity with rounds 1-2.
        n_chain = 10
        sus = []
        for r in range(3):
            x_cur = x0_e
            t0 = time.perf_counter()
            for i in range(n_chain):
                xtr, _, _ = episode(x_cur, jax.random.fold_in(key, 900 + 10 * r + i))
                x_cur = xtr[-1]
            jax.block_until_ready(x_cur)
            sus.append(time.perf_counter() - t0)
        sustained_hz = n_chain * N_STEPS / min(sus)

        control_hz = sustained_hz
        print(json.dumps({
            "metric": "closed_loop_control_hz",
            "value": round(control_hz, 1),
            "unit": "Hz",
            "vs_baseline": round(control_hz / BASELINE_CONTROL_HZ, 2),
            "pipelined_hz": round(pipelined_hz, 1),
            # 10 dependent 80-step episode dispatches (x0 chained), one final
            # sync — NOT a single 800-step kernel (VMEM, see comment above)
            "protocol": "sustained_800step_dependent_chain",
        }))
        return
    if mode == "chain":
        # round-2 default: the WHOLE 30-step CFG chain in one Pallas kernel
        # (state resident in VMEM across steps, per-step scalars baked;
        # validated vs ddpm_cfg_sample in tests/test_fused_denoise.py).
        from mpc_via_diffusion_model_tpu.ops.fused_denoise import make_fused_cfg_chain

        wd = jnp.bfloat16 if os.environ.get("BENCH_BF16", "0") == "1" else jnp.float32
        sample_override = make_fused_cfg_chain(
            model, params, diffusion.schedule, n_samples=1, w=CFG_W,
            n_diffusion_steps_without_noise=N_TAIL, weights_dtype=wd,
        )
    elif mode == "1":
        # round-1 path: single-Pallas-kernel denoiser launched per step
        # (validated in tests/test_fused_unet.py); CFG doubles the batch.
        from mpc_via_diffusion_model_tpu.ops.fused_unet import make_fused_unet

        fused = make_fused_unet(model, params, batch_size=2)
        apply_fn = lambda p, x, t, c, m: fused(x, t, c, m)

    closed_loop = make_closed_loop(
        diffusion, apply_fn, inputs_stats, cond_stats, plant, cost,
        horizon=HORIZON, n_steps=N_STEPS, w=CFG_W,
        n_diffusion_steps_without_noise=N_TAIL,
        sample_override=sample_override,
    )
    run = jax.jit(closed_loop)

    theta0 = 3.0
    x0 = jnp.array([0.0, 0.0, theta0, 0.0, float(theta_to_red_theta(theta0))])
    key = jax.random.PRNGKey(42)

    # compile + warmup
    result = run(params, x0, key)
    jax.block_until_ready(result.x_track)

    # timed runs: dispatches are issued back-to-back (JAX async dispatch) and
    # synchronized once at the end. This pipelines this dev container's ~31 ms
    # per-dispatch tunnel latency (an artifact of the relay, not of the TPU)
    # behind device compute, so the measured rate reflects the device's
    # sustained episode throughput; a serial block-per-call loop would report
    # relay latency, not TPU performance.
    n_rep = 10
    t0 = time.perf_counter()
    results = [run(params, x0, jax.random.fold_in(key, i)) for i in range(n_rep)]
    jax.block_until_ready([r.x_track for r in results])
    dt = (time.perf_counter() - t0) / n_rep

    control_hz = N_STEPS / dt
    print(
        json.dumps(
            {
                "metric": "closed_loop_control_hz",
                "value": round(control_hz, 1),
                "unit": "Hz",
                "vs_baseline": round(control_hz / BASELINE_CONTROL_HZ, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
