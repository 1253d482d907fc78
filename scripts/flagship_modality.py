"""One-state multi-modality flagship: the reference's SAMPLING_TIMES study.

Reproduces the reference's signature scientific result
(`Cart_Diffusion_inference.py:405-510` sampling loop, `:605-617` outcome
counting): repeated CFG-diffusion closed loops from the SAME initial state
produce BOTH left and right swing-ups, because the NMPC training data was
collected with two solver initial guesses per state
(`nmpc_multi_process_collect_data.py:37-39,143-153`).

Pipeline (one TPU chip, everything jitted):
1. collect — cold-start closed-loop iLQR data (``cold_start=True`` =
   every solve starts from the group's +/-kick guess, the reference's exact
   protocol) over the reference's grid
   (pos in linspace(-0.5, 0.5), theta in linspace(3pi/4, 5pi/4) INCLUDING
   pi, `nmpc_multi_process_collect_data.py:22-25`).
2. train — the flagship 1M-param conditional U-Net (T=25 exponential,
   CFG drop, cfg_indicator).
3. study — for each study x0: SAMPLING_TIMES seeded closed loops,
   left/right counting on the final theta, reference-convention costs vs
   BOTH +/- cold-start NMPC experts (`cost_NMPC_pos/neg`,
   `Cart_Diffusion_inference.py:538-575`).

Artifacts land in artifacts/flagship_modality/.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/flagship_modality")
    p.add_argument("--grid-pos", type=int, default=5)
    p.add_argument("--grid-theta", type=int, default=11, help="odd => includes pi")
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--noisy", type=int, default=10)
    p.add_argument("--horizon", type=int, default=64,
                   help="the reference collector's HOR=64 (nmpc_multi_process_collect_data.py:33)")
    p.add_argument("--train-steps", type=int, default=100000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--sampling-times", type=int, default=20)
    p.add_argument("--w", type=float, default=0.01)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--collect-only", action="store_true",
                   help="stop after saving dataset.npz (regenerates the "
                        "gitignored dataset for a committed checkpoint; the "
                        "collection is fully seeded so stats reproduce)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        count_swing_modes, make_closed_loop, make_nmpc_closed_loop,
        per_step_mpc_costs,
    )
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.generation import (
        collect_closed_loop_dataset, make_initial_state_grid,
    )
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, theta_to_red_theta
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig
    from mpc_via_diffusion_model_tpu.train import (
        ExperimentConfig, ModelConfig, TrainState, make_optimizer,
        make_scanned_train_steps, make_train_step, save_checkpoint,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, _ = get_plant("cartpole_virtual_swingup")
    # the COLLECTION cost (R=0.001): its cheap control makes the +/- saddle
    # solutions full swing-ups (theta -> 0 vs 2pi) instead of +-0.1 wiggles —
    # without it the two modes are so close the sampler averages them away
    from mpc_via_diffusion_model_tpu.dynamics import cartpole_virtual_collect_cost
    cost = cartpole_virtual_collect_cost()
    ExperimentConfig(
        model=ModelConfig(state_dim=1, n_support_points=args.horizon,
                          context_dim=5, cfg_indicator=True),
        dataset_path=os.path.join(args.out, "dataset.npz"),
        results_dir=args.out, plant="cartpole_virtual_swingup",
    ).to_yaml(os.path.join(args.out, "args.yaml"))

    # ------- 1) cold-start expert data (both basins at every state) -------
    t0 = time.time()
    grid = make_initial_state_grid(
        np.linspace(-0.5, 0.5, args.grid_pos),
        np.linspace(3 * np.pi / 4, 5 * np.pi / 4, args.grid_theta),
        state_dim=5, theta_to_virtual=theta_to_red_theta,
    )
    ds = collect_closed_loop_dataset(
        plant, cost, grid, horizon=args.horizon, n_control_steps=args.steps,
        solver_iterations=25, u_kick_scales=(5.0, -5.0),
        noise_std=0.15, n_noisy=args.noisy, key=jax.random.PRNGKey(0),
        cold_start=True,
    )
    t_collect = time.time() - t0
    print(f"[collect] {ds.n_init} cold-start samples in {t_collect:.1f}s", flush=True)
    ds.save(os.path.join(args.out, "dataset.npz"))

    if args.collect_only:
        print(f"[collect-only] wrote {os.path.join(args.out, 'dataset.npz')}; "
              f"stopping before training", flush=True)
        return

    # ------- 2) train -------
    model = TemporalUnet(
        state_dim=1, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=5, conditioning_type="default",
        cfg_indicator=True,
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    x = jnp.zeros((2, args.horizon, 1))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 5)), jnp.zeros((2, 1)))
    optimizer = make_optimizer(lr=3e-3)
    train_step = make_train_step(diffusion, model.apply, optimizer)
    chunk_fn = make_scanned_train_steps(train_step, args.chunk)
    chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
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
            print(f"[train] {(c + 1) * args.chunk}/{args.train_steps} "
                  f"loss {losses[-1]:.5f} ({rate:.0f} steps/s)", flush=True)
    t_train = time.time() - t0
    print(f"[train] done in {t_train:.1f}s; final loss {losses[-1]:.5f}", flush=True)
    save_checkpoint(os.path.join(args.out, "checkpoints", "final.ckpt"), state)
    np.save(os.path.join(args.out, "train_losses.npy"), np.asarray(losses))
    with open(os.path.join(args.out, "ema_params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(state.ema_params), f)

    # ------- 3) SAMPLING_TIMES study -------
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, ds.normalizer.stats["inputs"],
        ds.normalizer.stats["condition"], plant, cost,
        horizon=args.horizon, n_steps=80, w=args.w,
        n_diffusion_steps_without_noise=5,
    ))
    # +/- cold-start NMPC experts (the reference's cost_NMPC_pos / cost_NMPC_neg)
    nmpc_pos = jax.jit(make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=args.horizon, n_iterations=25),
        n_steps=80, u_init_scale=5.0, warm_start=False))
    nmpc_neg = jax.jit(make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=args.horizon, n_iterations=25),
        n_steps=80, u_init_scale=-5.0, warm_start=False))
    runs_fn = jax.jit(jax.vmap(lambda k, x0: loop(state.ema_params, x0, k),
                               in_axes=(0, None)))
    mpc_cost_total = jax.jit(lambda r: jnp.sum(per_step_mpc_costs(plant, cost, r)))

    # headline = the reference's exact study state: X0_IDX=12 of the 5x5
    # grid -> (pos=0, theta=pi), the symmetric saddle
    # (Cart_Diffusion_inference.py:29-32,355-371)
    study_x0 = [
        {"name": "pos0.0_theta_pi", "pos": 0.0, "theta": float(np.pi)},
        {"name": "pos0.25_theta_pi", "pos": 0.25, "theta": float(np.pi)},
        {"name": "pos-0.25_theta_pi", "pos": -0.25, "theta": float(np.pi)},
        {"name": "pos0.0_theta_3.0", "pos": 0.0, "theta": 3.0},
        {"name": "pos0.0_theta_3.3", "pos": 0.0, "theta": 3.3},
    ]
    results = []
    for entry in study_x0:
        x0 = jnp.array([entry["pos"], 0.0, entry["theta"], 0.0,
                        float(theta_to_red_theta(entry["theta"]))])
        keys = jax.random.split(jax.random.PRNGKey(7 + len(results)),
                                args.sampling_times)
        runs = runs_fn(keys, x0)
        modes = count_swing_modes(np.asarray(runs.x_track))
        costs = np.asarray(jax.jit(jax.vmap(mpc_cost_total))(runs))
        e_pos, e_neg = nmpc_pos(x0), nmpc_neg(x0)
        c_pos = float(mpc_cost_total(e_pos))
        c_neg = float(mpc_cost_total(e_neg))
        finals = np.asarray(runs.x_track)[:, -1, 2]
        rec = {
            **entry,
            "left": modes["left"], "right": modes["right"],
            "final_theta_min": float(finals.min()),
            "final_theta_max": float(finals.max()),
            "cost_diffusion_mean": float(costs.mean()),
            "cost_diffusion_min": float(costs.min()),
            "cost_diffusion_max": float(costs.max()),
            "cost_nmpc_pos": c_pos, "cost_nmpc_neg": c_neg,
        }
        results.append(rec)
        print(f"[study] {entry['name']}: left={rec['left']} right={rec['right']} "
              f"cost {rec['cost_diffusion_mean']:.1f} vs expert "
              f"{c_pos:.1f}/{c_neg:.1f}", flush=True)
        np.save(os.path.join(args.out, f"x_track_{entry['name']}.npy"),
                np.asarray(runs.x_track))
        np.save(os.path.join(args.out, f"u_track_{entry['name']}.npy"),
                np.asarray(runs.u_track))

    bimodal = [r for r in results if r["left"] > 0 and r["right"] > 0]
    report = {
        "n_samples": ds.n_init,
        "collect_seconds": round(t_collect, 1),
        "train_steps": args.train_steps,
        "train_seconds": round(t_train, 1),
        "final_loss": losses[-1],
        "sampling_times": args.sampling_times,
        "w": args.w,
        "study": results,
        "n_bimodal_states": len(bimodal),
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)

    # modality plot: per-seed theta trajectories colored by outcome (the
    # reference's gold/coral figure, Cart_Diffusion_inference.py:648-699)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpc_via_diffusion_model_tpu.eval.plotting import save_fig
    fig, axes = plt.subplots(1, len(study_x0), figsize=(4 * len(study_x0), 3.2),
                             sharey=True)
    for ax, entry in zip(np.atleast_1d(axes), study_x0):
        xs = np.load(os.path.join(args.out, f"x_track_{entry['name']}.npy"))
        for i in range(xs.shape[0]):
            right = xs[i, -1, 2] >= np.pi
            ax.plot(xs[i, :, 2], color="goldenrod" if right else "coral",
                    alpha=0.6, lw=1.0)
        ax.axhline(np.pi, color="k", ls=":", lw=0.8)
        ax.set_title(entry["name"], fontsize=9)
        ax.set_xlabel("control step")
    np.atleast_1d(axes)[0].set_ylabel("theta")
    fig.tight_layout()
    save_fig(fig, os.path.join(args.out, "modality"))
    print("artifacts in", args.out, flush=True)


if __name__ == "__main__":
    main()


