"""Quadrotor guided-planning flagship (BASELINE configs[4], VERDICT r1 #5).

The 12-state quadrotor must fly from a start region to hover at the origin
through a field of sphere obstacles:

1. expert — MPPI with the hover cost + soft obstacle penalty
   (`solvers/mppi.py`, `dynamics/quadrotor.py::obstacle_cost`), closed-loop
   data collection over a start grid, all on device;
2. train — conditional temporal U-Net on (state -> thrust/torque horizon);
3. guided inference — CFG sampling with the obstacle cost-GRADIENT guide
   injected into the denoising chain (the MPD guidance pattern,
   `inference_(mpd).py:254-298`, applied to control sampling), vs the same
   model unguided.

Metrics: goal-reach success, collision-free fraction, min obstacle
clearance, closed-loop cost vs the MPPI expert. Artifacts land in
artifacts/flagship_quadrotor/.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle
import time

import numpy as np

# the task definition (obstacles, cost, guide, eval starts, metrics) is
# shared by every quadrotor script — see quadrotor_task.py
from quadrotor_task import (
    HOVER_THRUST, OBS_CENTERS, OBS_RADII, eval_start_states,
    make_loop_guide_builder, make_task_cost, track_metrics,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/flagship_quadrotor")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--steps", type=int, default=60, help="collection control steps")
    p.add_argument("--n-starts", type=int, default=64)
    p.add_argument("--noisy", type=int, default=4)
    p.add_argument("--train-steps", type=int, default=100000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--eval-starts", type=int, default=16)
    p.add_argument("--guide-scale", type=float, default=0.1)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reuse", action="store_true",
                   help="load dataset.npz + checkpoints/final.ckpt from --out "
                        "instead of re-collecting/re-training (eval iteration)")
    p.add_argument("--collect-only", action="store_true",
                   help="stop after saving dataset.npz (regenerates the "
                        "gitignored dataset for a committed checkpoint; the "
                        "collection is fully seeded so stats reproduce)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers.mppi import MPPIConfig, mppi_solve
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
        save_checkpoint,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, quad_cost = get_plant("quadrotor")
    m_hover = HOVER_THRUST
    task_cost = make_task_cost(quad_cost)

    # ---------------- 1) MPPI expert collection ---------------- #
    rng = np.random.RandomState(0)
    starts = np.zeros((args.n_starts, 12), np.float32)
    starts[:, 0] = rng.uniform(2.2, 3.0, args.n_starts)        # x
    starts[:, 1] = rng.uniform(-1.2, 1.2, args.n_starts)       # y
    starts[:, 2] = rng.uniform(0.6, 1.4, args.n_starts)        # z
    # per-channel exploration noise: thrust rides on ~9.81 N; torques act on
    # inertias of 0.01 kg m^2 (omega_dot = tau/I), so torque noise must be
    # ~10x smaller or every rollout blows up within the 48-step horizon
    mppi_cfg = MPPIConfig(horizon=args.horizon, n_samples=256, n_iterations=8,
                          noise_sigma=(2.0, 0.15, 0.15, 0.15), temperature=1.0)

    u_hover = jnp.tile(jnp.array([m_hover, 0.0, 0.0, 0.0]), (args.horizon, 1))

    def collect_one(x0, key):
        def step(carry, k):
            x, u_ws = carry
            k_solve, k_noise = jax.random.split(k)
            us, _ = mppi_solve(plant, task_cost, x, u_ws, mppi_cfg, k_solve)
            outs = [(x, us)]
            if args.noisy > 0:
                noise = jax.random.normal(k_noise, (args.noisy, 12)) * 0.05
                xn = x[None] + noise
                kn = jax.random.split(k_noise, args.noisy)
                usn = jax.vmap(lambda xx, kk: mppi_solve(
                    plant, task_cost, xx, u_ws, mppi_cfg, kk)[0])(xn, kn)
                outs.append((xn, usn))
            x_next = plant.step(x, us[0])
            u_ws_next = jnp.concatenate([us[1:], us[-1:]], axis=0)
            return (x_next, u_ws_next), outs

        keys = jax.random.split(key, args.steps)
        _, outs = jax.lax.scan(step, (x0, u_hover), keys)
        return outs

    ds_path = os.path.join(args.out, "dataset.npz")
    ckpt_path = os.path.join(args.out, "checkpoints", "final.ckpt")
    reuse = args.reuse and os.path.exists(ds_path) and os.path.exists(ckpt_path)

    t0 = time.time()
    if reuse:
        ds = ControlSequenceDataset.load(ds_path)
        x_cat = np.asarray(ds.condition)
        t_collect = 0.0
        n_dropped = 0
        print(f"[collect] reused {len(x_cat)} samples from {ds_path}", flush=True)
    else:
        keys = jax.random.split(jax.random.PRNGKey(1), args.n_starts)
        outs = jax.jit(jax.vmap(collect_one))(jnp.asarray(starts), keys)
        xs = [np.asarray(outs[0][0]).reshape(-1, 12),
              np.asarray(outs[0][1]).reshape(-1, args.horizon, 4)]
        if args.noisy > 0:
            xs[0] = np.concatenate([xs[0], np.asarray(outs[1][0]).reshape(-1, 12)])
            xs[1] = np.concatenate([xs[1], np.asarray(outs[1][1]).reshape(-1, args.horizon, 4)])
        x_cat, u_cat = xs[0], xs[1]
        # drop diverged samples (same role as generation.py's non-finite
        # masking for iLQR): a closed-loop start that escapes the flyable
        # envelope yields astronomical states that wreck the Limits normalizer
        ok = (np.isfinite(x_cat).all(axis=1) & np.isfinite(u_cat).all(axis=(1, 2))
              & (np.abs(x_cat).max(axis=1) < 50.0) & (np.abs(u_cat).max(axis=(1, 2)) < 100.0))
        n_dropped = int((~ok).sum())
        x_cat, u_cat = x_cat[ok], u_cat[ok]
        t_collect = time.time() - t0
        print(f"[collect] {len(x_cat)} MPPI samples in {t_collect:.1f}s "
              f"({n_dropped} diverged samples dropped)", flush=True)
        ds = ControlSequenceDataset.from_arrays(u_cat, x_cat)
        ds.save(ds_path)

    if args.collect_only:
        # --reuse + --collect-only with both files present is a no-op: say so
        # instead of claiming a write that never happened (ADVICE r3)
        verb = "reused existing" if reuse else "wrote"
        print(f"[collect-only] {verb} {ds_path}; stopping before training",
              flush=True)
        return

    # ---------------- 2) train ---------------- #
    model = TemporalUnet(
        state_dim=4, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=12, conditioning_type="default",
        cfg_indicator=True,
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((2, args.horizon, 4)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 12)),
                        jnp.zeros((2, 1)))
    if reuse:
        from mpc_via_diffusion_model_tpu.train import load_checkpoint
        state, _ = load_checkpoint(ckpt_path)
        t_train = 0.0
        losses = [None]  # json-safe: NaN would be invalid strict JSON
        print(f"[train] reused checkpoint {ckpt_path}", flush=True)
    else:
        optimizer = make_optimizer(lr=3e-3)
        train_step = make_train_step(diffusion, model.apply, optimizer)
        chunk_fn = make_scanned_train_steps(train_step, args.chunk)
        chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
        state = TrainState(params, jax.tree_util.tree_map(jnp.copy, params),
                           optimizer.init(params), jnp.int32(0))
        key = jax.random.PRNGKey(3)
        t0 = time.time()
        losses = []
        for c in range(args.train_steps // args.chunk):
            key, k = jax.random.split(key)
            state, loss = chunk_jit(state, ds.inputs_normalized, ds.condition_normalized, k)
            losses.append(float(loss))
        t_train = time.time() - t0
        print(f"[train] {args.train_steps} steps in {t_train:.1f}s; "
              f"loss {losses[0]:.5f} -> {losses[-1]:.5f}", flush=True)
        save_checkpoint(ckpt_path, state)
        with open(os.path.join(args.out, "ema_params.pkl"), "wb") as f:
            pickle.dump(jax.device_get(state.ema_params), f)

    # ---------------- 3) guided vs unguided closed loop ---------------- #
    u_stats = ds.normalizer.stats["inputs"]
    # obstacle-clearance guide on NORMALIZED u batches (quadrotor_task):
    # descend the rolled-out obstacle penalty through the plant, the
    # control-space analogue of the reference's GuideManagerTrajectories step
    guide_builder = make_loop_guide_builder(plant, u_stats, args.guide_scale)

    def run_eval(guided: bool):
        loop = jax.jit(make_closed_loop(
            diffusion, model.apply, ds.normalizer.stats["inputs"],
            ds.normalizer.stats["condition"], plant, task_cost,
            horizon=args.horizon, n_steps=args.steps, w=0.01,
            n_diffusion_steps_without_noise=5,
            guide_builder=guide_builder if guided else None,
            n_guide_steps=1, t_start_guide=float(diffusion.schedule.n_steps) / 2,
        ))
        ev = eval_start_states(args.eval_starts)
        ks = jax.random.split(jax.random.PRNGKey(11), args.eval_starts)
        runs = jax.jit(jax.vmap(lambda x0, k: loop(state.ema_params, x0, k)))(
            jnp.asarray(ev), ks)
        xt = np.asarray(runs.x_track)  # (N, steps+1, 12)
        return track_metrics(xt, runs.stage_costs), xt, ev

    res_guided, xt_g, ev = run_eval(True)
    res_unguided, xt_u, _ = run_eval(False)

    # MPPI expert on the same eval starts
    def expert_run(x0, key):
        def step(carry, k):
            x, u_ws = carry
            us, _ = mppi_solve(plant, task_cost, x, u_ws, mppi_cfg, k)
            x_next = plant.step(x, us[0])
            stage = task_cost.stage(x, us[0])
            return (x_next, jnp.concatenate([us[1:], us[-1:]], axis=0)), (x_next, stage)

        keys = jax.random.split(key, args.steps)
        (_, _), (xs2, stages) = jax.lax.scan(step, (x0, u_hover), keys)
        return jnp.concatenate([x0[None], xs2], axis=0), stages

    ks = jax.random.split(jax.random.PRNGKey(13), args.eval_starts)
    xt_e, stages_e = jax.jit(jax.vmap(expert_run))(jnp.asarray(ev), ks)
    xt_e = np.asarray(xt_e)
    res_expert = track_metrics(xt_e, stages_e)

    report = {
        "n_samples": int(len(x_cat)),
        "collect_seconds": round(t_collect, 1),
        "train_seconds": round(t_train, 1),
        "final_loss": losses[-1],
        "obstacles": {"centers": OBS_CENTERS.tolist(), "radii": OBS_RADII.tolist()},
        "guided": res_guided,
        "unguided": res_unguided,
        "mppi_expert": res_expert,
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)
    np.save(os.path.join(args.out, "x_guided.npy"), xt_g)
    np.save(os.path.join(args.out, "x_unguided.npy"), xt_u)
    np.save(os.path.join(args.out, "x_expert.npy"), xt_e)

    # top-down plot
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpc_via_diffusion_model_tpu.eval.plotting import save_fig
    fig, axes = plt.subplots(1, 3, figsize=(14, 4.4), sharex=True, sharey=True)
    for ax, (xt, title) in zip(axes, [(xt_e, "MPPI expert"), (xt_g, "diffusion + guide"),
                                      (xt_u, "diffusion unguided")]):
        for c, r in zip(OBS_CENTERS, OBS_RADII):
            ax.add_patch(plt.Circle((c[0], c[1]), r, color="gray", alpha=0.5))
        for i in range(xt.shape[0]):
            ax.plot(xt[i, :, 0], xt[i, :, 1], lw=0.8, alpha=0.7)
        ax.plot(0, 0, "k*", ms=12)
        ax.set_title(title)
        ax.set_aspect("equal")
    fig.tight_layout()
    save_fig(fig, os.path.join(args.out, "topdown"))
    print("artifacts in", args.out, flush=True)


if __name__ == "__main__":
    main()
