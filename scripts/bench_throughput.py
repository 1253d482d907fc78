"""Secondary benchmarks: DDIM fast mode, candidate sweeps, distilled student.

Covers BASELINE.json configs beyond the headline:
- configs[2]: DDIM sampler (T//5 steps) closed loop,
- configs[3]: batched candidate sampling (n candidates per replan with
  min-cost selection; default 4096/replan per the config),
- configs[1]: pendulum + PointUnet-style short-horizon denoiser,
- distilled: the progressively-distilled 3-eval student
  (scripts/distill_flagship.py) through the fused Pallas DDIM chain —
  the few-step closed loop with guidance baked in. Uses the committed
  artifacts/distilled weights when present (and reports the closed-loop
  cost ratio vs the stored expert cost), synthetic weights otherwise.

Prints one JSON line per config.
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


def _time_loop(run, *args, n_rep=8):
    """Async-pipelined timing (same protocol as bench.py): dispatches are
    issued back-to-back and synchronized once, hiding this container's ~31 ms
    per-dispatch relay latency behind device compute."""
    out = run(*args)
    jax.block_until_ready(out.x_track)
    t0 = time.perf_counter()
    outs = [run(*args) for _ in range(n_rep)]
    jax.block_until_ready([o.x_track for o in outs])
    return (time.perf_counter() - t0) / n_rep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--candidates", type=int, default=4096)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_swingup, cartpole_virtual_cost, pendulum, pendulum_cost,
        theta_to_red_theta,
    )
    from mpc_via_diffusion_model_tpu.models import PointUnet, TemporalUnet, UNET_DIM_MULTS

    n_steps = 80
    horizon = 32
    model = TemporalUnet(state_dim=1, n_support_points=horizon, unet_input_dim=32,
                         dim_mults=UNET_DIM_MULTS[0], context_dim=5,
                         conditioning_type="default")
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    plant, cost = cartpole_virtual_swingup(), cartpole_virtual_cost()
    x = jnp.zeros((1, horizon, 1))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 5)), jnp.zeros((1, 1)))
    inputs_stats = NormalizerStats("limits", mins=jnp.full((1,), -30.0), maxs=jnp.full((1,), 30.0))
    cond_stats = NormalizerStats("limits", mins=jnp.full((5,), -10.0), maxs=jnp.full((5,), 10.0))
    theta0 = 3.0
    x0 = jnp.array([0.0, 0.0, theta0, 0.0, float(theta_to_red_theta(theta0))])
    key = jax.random.PRNGKey(1)

    # --- DDIM fast mode (configs[2]) ---
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, inputs_stats, cond_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, sampler="ddim"))
    dt = _time_loop(loop, params, x0, key)
    print(json.dumps({"metric": "ddim_closed_loop_hz", "value": round(n_steps / dt, 1), "unit": "Hz"}), flush=True)

    # --- candidate sweep (configs[3]) ---
    loop_c = jax.jit(make_closed_loop(
        diffusion, model.apply, inputs_stats, cond_stats, plant, cost,
        horizon=horizon, n_steps=n_steps, n_candidates=args.candidates))
    dt = _time_loop(loop_c, params, x0, key)
    print(json.dumps({
        "metric": f"candidates{args.candidates}_closed_loop_hz",
        "value": round(n_steps / dt, 1), "unit": "Hz",
        "trajectories_per_sec": round(n_steps * args.candidates / dt, 0),
    }), flush=True)

    # --- pendulum + PointUnet short horizon (configs[1]) ---
    pmodel = PointUnet(state_dim=8, dim=32, context_dim=2, conditioning_type="default")
    pparams = pmodel.init(jax.random.PRNGKey(2), jnp.zeros((1, 1, 8)),
                          jnp.zeros((1,), jnp.int32), jnp.zeros((1, 2)), jnp.zeros((1, 1)))
    pplant, pcost = pendulum(dt=0.05), pendulum_cost()
    # 8-step horizon packed as one "point" of 8 controls
    pin_stats = NormalizerStats("limits", mins=jnp.full((8,), -10.0), maxs=jnp.full((8,), 10.0))
    pc_stats = NormalizerStats("limits", mins=jnp.full((2,), -8.0), maxs=jnp.full((2,), 8.0))

    def papply(pp, xx, tt, cc, mm):
        return pmodel.apply(pp, xx, tt, cc, mm)

    from mpc_via_diffusion_model_tpu.control import make_replan_fn
    from mpc_via_diffusion_model_tpu.data.normalization import unnormalize, normalize

    pdiff = GaussianDiffusion(schedule=make_schedule("exponential", 25))

    def ploop(pp, x0p, k):
        keys = jax.random.split(k, n_steps)

        def body(xc, kk):
            cond = normalize(pc_stats, xc)[None, :]
            u_norm = pdiff.ddpm_cfg_sample(
                lambda x, t, c, m: papply(pp, x, t, c, m), (1, 1, 8), kk, cond, w=0.01,
                n_diffusion_steps_without_noise=5)
            u = unnormalize(pin_stats, u_norm)[0, 0]
            x_next = pplant.step(xc, u[:1])
            return x_next, (x_next, u[:1], u[:, None], pcost.stage(xc, u[:1]))

        xf, (xs, us, uh, st) = jax.lax.scan(body, x0p, keys)
        from mpc_via_diffusion_model_tpu.control import ClosedLoopResult
        return ClosedLoopResult(jnp.concatenate([x0p[None], xs]), us, uh, st)

    ploop_j = jax.jit(ploop)
    dt = _time_loop(ploop_j, pparams, jnp.array([np.pi, 0.0]), key)
    print(json.dumps({"metric": "pendulum_pointunet_closed_loop_hz",
                      "value": round(n_steps / dt, 1), "unit": "Hz"}), flush=True)

    # --- distilled few-step student through the fused Pallas DDIM chain ---
    import os
    import pickle

    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset

    d_horizon = 64
    dmodel = TemporalUnet(state_dim=1, n_support_points=d_horizon,
                          unet_input_dim=32, dim_mults=UNET_DIM_MULTS[0],
                          context_dim=5, conditioning_type="default",
                          cfg_indicator=True)
    art = "artifacts/distilled"
    teacher_art = "artifacts/flagship_modality"
    report = {}
    if os.path.exists(os.path.join(art, "report.json")):
        with open(os.path.join(art, "report.json")) as f:
            report = json.load(f)
    times = report.get("rounds", [{}])[-1].get("times", [23, 15, 7])
    pkl = os.path.join(art, f"student_{len(times)}eval.pkl")
    real_weights = os.path.exists(pkl) and os.path.exists(
        os.path.join(teacher_art, "dataset.npz"))
    if real_weights:
        with open(pkl, "rb") as f:
            dparams = pickle.load(f)
        dds = ControlSequenceDataset.load(os.path.join(teacher_art, "dataset.npz"))
        d_in_stats = dds.normalizer.stats["inputs"]
        d_c_stats = dds.normalizer.stats["condition"]
    else:
        dx = jnp.zeros((1, d_horizon, 1))
        dparams = dmodel.init(jax.random.PRNGKey(3), dx, jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 5)), jnp.zeros((1, 1)))
        d_in_stats, d_c_stats = inputs_stats, cond_stats
    # the collection-cost convention — the same one the distill report's
    # expert_cost was computed under (scripts/distill_flagship.py)
    from mpc_via_diffusion_model_tpu.dynamics import cartpole_virtual_collect_cost
    from mpc_via_diffusion_model_tpu.ops.fused_episode import make_fused_ddim_episode

    dcost = cartpole_virtual_collect_cost()
    dsch = diffusion.schedule
    episode = jax.jit(make_fused_ddim_episode(
        dmodel, dparams, dsch, times, d_in_stats, d_c_stats, plant, dcost,
        n_steps=n_steps))
    jax.block_until_ready(episode(x0, key))
    t0 = time.perf_counter()
    outs = [episode(x0, jax.random.fold_in(key, i)) for i in range(8)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 8
    row = {"metric": f"distilled_{len(times)}eval_fused_episode_hz",
           "value": round(n_steps / dt, 1), "unit": "Hz",
           "real_weights": bool(real_weights)}
    if real_weights and "expert_cost" in report:
        _, _, costs = episode(x0, key)
        row["cost_ratio_vs_expert"] = round(
            float(jnp.sum(costs)) / report["expert_cost"], 4)
    print(json.dumps(row), flush=True)

    # serving throughput: a fleet of independent distilled episodes vmapped
    # over starts (the Pallas episode kernel lifts to a grid axis under
    # vmap) — the aggregate control-steps/s a single chip serves when many
    # control loops run concurrently
    n_fleet = 64
    fleet = jax.jit(jax.vmap(episode))
    rngf = np.random.RandomState(5)
    x0f = np.tile(np.asarray(x0)[None], (n_fleet, 1))
    x0f[:, 0] += rngf.uniform(-0.5, 0.5, n_fleet)
    x0f = jnp.asarray(x0f, jnp.float32)
    keysf = jax.random.split(jax.random.PRNGKey(17), n_fleet)
    jax.block_until_ready(fleet(x0f, keysf))
    reps = []
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fleet(x0f, jax.random.split(jax.random.PRNGKey(r), n_fleet)))
        reps.append(time.perf_counter() - t0)
    print(json.dumps({"metric": f"serving_{n_fleet}loops_control_steps_per_sec",
                      "value": round(n_fleet * n_steps / min(reps), 0),
                      "unit": "steps/s"}), flush=True)

    # production CFG flagship: the REAL trained horizon-64 model through the
    # whole-episode CFG kernel with bf16 weights (2x64 = 128 stacked rows is
    # MXU-throughput-bound, where bf16 measures 2.97x over fp32 at identical
    # closed-loop cost — BENCH.md "bf16 weights")
    if (real_weights and "expert_cost" in report
            and os.path.exists(os.path.join(teacher_art, "ema_params.pkl"))):
        from mpc_via_diffusion_model_tpu.ops.fused_episode import make_fused_cfg_episode

        with open(os.path.join(teacher_art, "ema_params.pkl"), "rb") as f:
            tparams = pickle.load(f)
        cfg_ep = jax.jit(make_fused_cfg_episode(
            dmodel, tparams, dsch, d_in_stats, d_c_stats, plant, dcost,
            n_steps=n_steps, w=0.01, n_diffusion_steps_without_noise=5,
            weights_dtype=jnp.bfloat16))
        jax.block_until_ready(cfg_ep(x0, key))
        dts = []
        for b in range(3):
            t0 = time.perf_counter()
            outs = [cfg_ep(x0, jax.random.fold_in(key, 50 * b + i)) for i in range(8)]
            jax.block_until_ready(outs)
            dts.append((time.perf_counter() - t0) / 8)
        _, _, ccosts = cfg_ep(x0, key)
        print(json.dumps({
            "metric": "production_cfg30_flagship_bf16_hz",
            "value": round(n_steps / min(dts), 1), "unit": "Hz",
            "cost_ratio_vs_expert": round(float(jnp.sum(ccosts)) / report["expert_cost"], 4),
        }), flush=True)

    # sustained rate: one long receding-horizon run per dispatch (800 steps)
    ep800 = jax.jit(make_fused_ddim_episode(
        dmodel, dparams, dsch, times, d_in_stats, d_c_stats, plant, dcost,
        n_steps=800))
    jax.block_until_ready(ep800(x0, key))
    reps = []
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(ep800(x0, jax.random.fold_in(key, r)))
        reps.append(time.perf_counter() - t0)
    print(json.dumps({"metric": f"distilled_{len(times)}eval_sustained_hz",
                      "value": round(800 / min(reps), 1), "unit": "Hz"}),
          flush=True)


if __name__ == "__main__":
    main()
