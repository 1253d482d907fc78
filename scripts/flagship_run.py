"""End-to-end flagship run on TPU: collect -> train -> evaluate -> artifacts.

The round-1 production demonstration: on-device iLQR expert data for the
5-state swing-up cart-pole, 1M-param conditional U-Net trained with the
scanned train step, closed-loop evaluation vs the NMPC expert with the
reference's parity metrics. Artifacts land in artifacts/flagship/.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/flagship")
    p.add_argument("--plant", default="cartpole",
                   choices=["cartpole", "acrobot", "panda", "panda_rbd"])
    p.add_argument("--grid-pos", type=int, default=5)
    p.add_argument("--grid-theta", type=int, default=10)
    p.add_argument("--steps", type=int, default=40, help="closed-loop collection steps")
    p.add_argument("--noisy", type=int, default=5)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--train-steps", type=int, default=20000)
    p.add_argument("--chunk", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reuse", action="store_true",
                   help="load dataset.npz + checkpoints/final.ckpt from --out "
                        "instead of re-collecting/re-training (eval iteration)")
    p.add_argument("--collect-only", action="store_true",
                   help="regenerate just dataset.npz (seeded, bit-compatible) "
                        "and stop before training — container recreations "
                        "wipe gitignored datasets; this restores them without "
                        "touching the committed report/plots (the "
                        "flagship_quadrotor/flagship_modality pattern)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        count_swing_modes, make_closed_loop, make_nmpc_closed_loop,
        per_step_mpc_costs, track_parity,
    )
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.generation import (
        collect_closed_loop_dataset, make_initial_state_grid,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, theta_to_red_theta
    from mpc_via_diffusion_model_tpu.data.generation import make_acrobot_grid
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
        save_checkpoint,
    )

    os.makedirs(args.out, exist_ok=True)
    # phase-level chrome-trace spans (C++ ring-buffer recorder); dumped to
    # <out>/trace.json at the end — load in chrome://tracing / Perfetto
    from mpc_via_diffusion_model_tpu.native.tracer import Tracer
    tracer = Tracer()
    # crash-safe: if any phase raises, whatever spans completed (plus the
    # in-flight phase, truncated) are still dumped at interpreter exit
    tracer.dump_at_exit(os.path.join(args.out, "trace.json"))
    plant_name = {"cartpole": "cartpole_virtual_swingup", "acrobot": "acrobot",
                  "panda": "panda_surrogate", "panda_rbd": "panda"}[args.plant]
    plant, cost = get_plant(plant_name)
    to_cond = None
    cond_dim = plant.state_dim
    control_dim = plant.control_dim
    if args.plant == "panda":
        from mpc_via_diffusion_model_tpu.dynamics import panda_context
        to_cond = panda_context
        cond_dim = 20  # (q7 | qd7 | ee_pos3 | ee_vel3), the reference's Panda context
    elif args.plant == "panda_rbd":
        # full recursive-Newton-Euler articulated dynamics (VERDICT r1 #3);
        # state is shifted by the ready pose, context uses true joint angles
        from mpc_via_diffusion_model_tpu.dynamics import make_panda_context
        to_cond = make_panda_context()
        cond_dim = 20

    # record the run config (incl. cfg_indicator — it changes the FiLM width)
    from mpc_via_diffusion_model_tpu.train import ExperimentConfig, ModelConfig
    ExperimentConfig(
        model=ModelConfig(state_dim=control_dim, n_support_points=args.horizon,
                          context_dim=cond_dim, cfg_indicator=True),
        dataset_path=os.path.join(args.out, "dataset.npz"),
        results_dir=args.out, plant=plant_name,
    ).to_yaml(os.path.join(args.out, "args.yaml"))

    # ---------------- 1) expert data (on device) ----------------
    tracer.begin("collect")
    t0 = time.time()
    if args.plant == "cartpole":
        grid = make_initial_state_grid(
            np.linspace(-1, 1, args.grid_pos),
            np.linspace(3 * np.pi / 4, 5 * np.pi / 4, args.grid_theta),
            state_dim=5, theta_to_virtual=theta_to_red_theta,
        )
        kicks = (5.0, -5.0)
    elif args.plant == "acrobot":
        # acrobot: (theta1 x theta2) grid over [-pi/2, pi/2]
        # (reference acrobots_nmpc.py:63-75), +/-40 torque kicks (U_GUESS)
        grid = make_acrobot_grid(
            np.linspace(-np.pi / 2, np.pi / 2, args.grid_pos),
            np.linspace(-np.pi / 2, np.pi / 2, args.grid_theta),
        )
        kicks = (40.0, -40.0)
    else:
        # panda: random joint postures at rest (the reference samples MuJoCo
        # states; here q ~ U[-r, r]^7 around the regulation target, qd = 0).
        # The RBD plant regulates around the gravity-loaded ready pose, so
        # its start region is tighter than the linear surrogate's.
        r = 0.35 if args.plant == "panda_rbd" else 0.6
        rng0 = np.random.RandomState(0)
        n_grid = args.grid_pos * args.grid_theta
        grid = np.concatenate([
            rng0.uniform(-r, r, (n_grid, 7)).astype(np.float32),
            np.zeros((n_grid, 7), np.float32),
        ], axis=1)
        kicks = (2.0, -2.0)
    ds_path = os.path.join(args.out, "dataset.npz")
    ckpt_path = os.path.join(args.out, "checkpoints", "final.ckpt")
    reuse = args.reuse and os.path.exists(ds_path)
    reuse_ckpt = reuse and os.path.exists(ckpt_path)
    if reuse:
        from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
        ds = ControlSequenceDataset.load(ds_path)
        t_collect = 0.0
        print(f"[collect] reused {ds.n_init} samples from {ds_path}", flush=True)
    elif args.plant == "panda_rbd":
        # the articulated plant is ~20x the surrogate's per-solve cost;
        # one whole-grid dispatch runs tens of minutes and trips the device
        # worker, so collect in per-chunk dispatches and merge
        from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset

        chunk_n = 4
        us_l, xs_l = [], []
        for ci in range(0, len(grid), chunk_n):
            u_c, x_c, _ = collect_closed_loop_dataset(
                plant, cost, grid[ci:ci + chunk_n], horizon=args.horizon,
                n_control_steps=args.steps, solver_iterations=25,
                u_kick_scales=kicks, noise_std=0.15, n_noisy=args.noisy,
                key=jax.random.PRNGKey(ci), state_to_condition=to_cond,
                return_arrays=True,
            )
            us_l.append(u_c); xs_l.append(x_c)
            print(f"[collect] chunk {ci // chunk_n + 1}/"
                  f"{(len(grid) + chunk_n - 1) // chunk_n} "
                  f"({sum(len(u) for u in us_l)} samples, "
                  f"{time.time() - t0:.0f}s)", flush=True)
        ds = ControlSequenceDataset.from_arrays(
            np.concatenate(us_l), np.concatenate(xs_l))
    else:
        ds = collect_closed_loop_dataset(
            plant, cost, grid, horizon=args.horizon, n_control_steps=args.steps,
            solver_iterations=25, u_kick_scales=kicks,
            noise_std=0.15, n_noisy=args.noisy, key=jax.random.PRNGKey(0),
            state_to_condition=to_cond,
        )
    n_solves = ds.n_init
    if not reuse:
        t_collect = time.time() - t0
        print(f"[collect] {ds.n_init} samples in {t_collect:.1f}s "
              f"({n_solves / t_collect:.0f} iLQR solves/s)", flush=True)
        ds.save(ds_path)

    tracer.end()
    if args.collect_only:
        # dump to a side file so the atexit handler no-ops and the
        # COMMITTED full-run trace.json in --out is not clobbered
        tracer.dump(os.path.join(args.out, "trace_collect_only.json"))
        print(f"[collect-only] dataset saved to {ds_path}; stopping before "
              "training", flush=True)
        return
    # ---------------- 2) train (scanned chunks) ----------------
    tracer.begin("train")
    model = TemporalUnet(
        state_dim=control_dim, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=cond_dim, conditioning_type="default",
        cfg_indicator=True,  # disambiguate dropped vs genuinely-zero context
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    x = jnp.zeros((2, args.horizon, control_dim))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, cond_dim)), jnp.zeros((2, 1)))
    optimizer = make_optimizer(lr=3e-3)
    train_step = make_train_step(diffusion, model.apply, optimizer)
    chunk_fn = make_scanned_train_steps(train_step, args.chunk)
    chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))

    if reuse_ckpt:
        from mpc_via_diffusion_model_tpu.train import load_checkpoint
        state, extra = load_checkpoint(ckpt_path)
        losses = list(extra.get("losses", [])) or [None]  # json-safe fallback
        t_train = 0.0
        print(f"[train] reused checkpoint {ckpt_path}", flush=True)
    else:
        state = TrainState(
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=optimizer.init(params),
            step=jnp.int32(0),
        )
        key = jax.random.PRNGKey(2)
        t0 = time.time()
        losses = []
        n_chunks = args.train_steps // args.chunk
        for c in range(n_chunks):
            key, k = jax.random.split(key)
            state, loss = chunk_jit(state, ds.inputs_normalized, ds.condition_normalized, k)
            losses.append(float(loss))
            if (c + 1) % max(1, n_chunks // 10) == 0:
                rate = (c + 1) * args.chunk / (time.time() - t0)
                print(f"[train] step {(c + 1) * args.chunk}/{args.train_steps} "
                      f"loss {losses[-1]:.5f} ({rate:.0f} steps/s)", flush=True)
        t_train = time.time() - t0
        print(f"[train] done in {t_train:.1f}s; loss {losses[0]:.4f} -> {losses[-1]:.5f}", flush=True)
        save_checkpoint(ckpt_path, state, extra={"losses": losses})
        np.save(os.path.join(args.out, "train_losses.npy"), np.asarray(losses))
        # ALSO write the committed-artifact EMA pickle (the acrobot/cart-pole
        # artifact format): checkpoints/ is gitignored and container
        # recreations wipe it — the round-3 panda teacher was lost that way
        import pickle
        with open(os.path.join(args.out, "ema_params.pkl"), "wb") as f:
            pickle.dump({"ema_params": jax.device_get(state.ema_params),
                         "step": int(state.step),
                         "cfg_indicator": True}, f)

    tracer.end()
    # ---------------- 3) closed-loop evaluation ----------------
    tracer.begin("evaluate")
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, ds.normalizer.stats["inputs"],
        ds.normalizer.stats["condition"], plant, cost,
        horizon=args.horizon, n_steps=80, w=0.01, n_diffusion_steps_without_noise=5,
        state_to_condition=to_cond,
    ))
    if args.plant == "cartpole":
        theta0 = 3.0
        x0 = jnp.array([0.0, 0.0, theta0, 0.0, float(theta_to_red_theta(theta0))])
    elif args.plant == "acrobot":
        x0 = jnp.asarray(make_acrobot_grid([0.7], [-0.7])[0])
    elif args.plant == "panda_rbd":
        x0 = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])
    else:
        x0 = jnp.concatenate([jnp.full((7,), 0.4), jnp.zeros(7)])
    keys = jax.random.split(jax.random.PRNGKey(7), 10)
    runs = jax.jit(jax.vmap(lambda k: loop(state.ema_params, x0, k)))(keys)

    nmpc = jax.jit(make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=args.horizon, n_iterations=25),
        n_steps=80, u_init_scale=kicks[0]))
    expert = nmpc(x0)

    # independent-solver cross-check (VERDICT r1 weak #7): both the diffusion
    # controller AND its iLQR expert descend the same gradients, so anchor
    # the expert against a sampling-based solver of a different family (MPPI)
    # on the same state — closed-loop costs should agree to a few percent.
    cross_check = None
    if args.plant in ("panda_rbd", "acrobot"):
        from mpc_via_diffusion_model_tpu.solvers.mppi import MPPIConfig, mppi_solve
        # MPPI plans over a SHORTER horizon than the iLQR expert where the
        # plant is expensive (32 vs 128 on the articulated arm: full-horizon
        # sampling rollouts are one ~30-min dispatch, which the device
        # worker kills); a short-horizon MPPI is still a valid independent
        # controller for anchoring the closed-loop cost (both run the same
        # 80-step receding-horizon protocol). Exploration noise is scaled
        # to the plant's torque range.
        if args.plant == "acrobot":
            mcfg = MPPIConfig(horizon=32, n_samples=512, n_iterations=8,
                              noise_sigma=15.0, temperature=2.0)
        else:
            mcfg = MPPIConfig(horizon=32, n_samples=256, n_iterations=6,
                              noise_sigma=1.0, temperature=0.5)

        def mppi_loop(x0m, k):
            u_ws = jnp.zeros((mcfg.horizon, plant.control_dim))

            def body(carry, kk):
                xm, ws = carry
                us, _ = mppi_solve(plant, cost, xm, ws, mcfg, kk)
                stage = cost.stage(xm, us[0])
                xn = plant.step(xm, us[0])
                return (xn, jnp.concatenate([us[1:], us[-1:]])), stage
            (_, _), stages = jax.lax.scan(body, (x0m, u_ws), jax.random.split(k, 80))
            return jnp.sum(stages)

        c_mppi = float(jax.jit(mppi_loop)(x0, jax.random.PRNGKey(9)))
        cross_check = {"mppi_closed_loop_cost": round(c_mppi, 2),
                       "ilqr_closed_loop_cost": round(float(np.asarray(expert.stage_costs).sum()), 2)}
        print(f"[cross-check] iLQR {cross_check['ilqr_closed_loop_cost']} vs "
              f"MPPI {c_mppi:.2f}", flush=True)

    one = jax.tree_util.tree_map(lambda a: a[0], runs)
    parity = track_parity(one, expert)
    c_diff = float(np.mean([float(np.sum(np.asarray(per_step_mpc_costs(
        plant, cost, jax.tree_util.tree_map(lambda a: a[i], runs))))) for i in range(10)]))
    c_mpc = float(np.sum(np.asarray(per_step_mpc_costs(plant, cost, expert))))
    modes = count_swing_modes(np.asarray(runs.x_track))
    cl_diff = float(np.mean(np.asarray(runs.stage_costs.sum(axis=1))))
    cl_mpc = float(np.asarray(expert.stage_costs).sum())

    report = {
        "n_samples": ds.n_init,
        "collect_seconds": round(t_collect, 1),
        "solves_per_second": round(n_solves / t_collect, 1) if t_collect > 0 else None,
        "train_steps": args.train_steps,
        "train_seconds": round(t_train, 1),
        "final_loss": losses[-1],
        "parity": {k: round(v, 5) for k, v in parity.items()},
        "closed_loop_cost_diffusion_mean10": round(cl_diff, 1),
        "closed_loop_cost_nmpc": round(cl_mpc, 1),
        "horizon_cost_diffusion_mean10": round(c_diff, 1),
        "horizon_cost_nmpc": round(c_mpc, 1),
        "modality": modes,
    }
    if cross_check is not None:
        report["expert_cross_check"] = cross_check
    tracer.end()
    tracer.dump(os.path.join(args.out, "trace.json"))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)

    np.save(os.path.join(args.out, "x_diffusion.npy"), np.asarray(runs.x_track))
    np.save(os.path.join(args.out, "u_diffusion.npy"), np.asarray(runs.u_track))
    np.save(os.path.join(args.out, "x_mpc.npy"), np.asarray(expert.x_track))
    np.save(os.path.join(args.out, "u_mpc.npy"), np.asarray(expert.u_track))

    from mpc_via_diffusion_model_tpu.eval.plotting import plot_closed_loop_comparison, save_fig
    fig = plot_closed_loop_comparison(
        [np.asarray(one.x_track), np.asarray(expert.x_track)],
        [np.asarray(one.u_track), np.asarray(expert.u_track)],
        labels=["diffusion", "nmpc"], dt=plant.dt,
        state_names=(["x", "xdot", "theta", "thetadot", "theta*"]
                     if args.plant == "cartpole"
                     else (["th1", "th2", "dth1", "dth2", "th1*", "th2*"]
                           if args.plant == "acrobot"
                           else [f"q{i}" for i in range(7)] + [f"qd{i}" for i in range(7)])),
    )
    save_fig(fig, os.path.join(args.out, "comparison"))
    print("artifacts in", args.out, flush=True)


if __name__ == "__main__":
    main()
