"""Closed-loop evaluation CLI: diffusion controller vs iLQR-NMPC expert.

Replaces `scripts/inference/Diffusion_MPC_Inference.py` /
`Cart_Diffusion_inference.py`: runs the fused receding-horizon diffusion
loop (optionally SAMPLING_TIMES repeats from the same x0 to expose
multi-modality), runs the expert NMPC loop(s) with +/- basin kicks, saves
.npy tracks + a comparison figure, prints the reference's parity metrics
(per-dim L1 sums, per-step cost, left/right modality counts, total times).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, help=".npz used for normalizer stats")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--plant", default="cartpole_virtual_swingup")
    p.add_argument("--x0-pos", type=float, default=0.0)
    p.add_argument("--x0-theta", type=float, default=3.0)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--w", type=float, default=0.01, help="CFG guidance weight")
    p.add_argument("--tail", type=int, default=5, help="noise-free diffusion steps")
    p.add_argument("--sampling-times", type=int, default=10)
    p.add_argument("--n-candidates", type=int, default=1)
    p.add_argument("--results-dir", default="logs/closed_loop")
    p.add_argument("--seed", type=int, default=30)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
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
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, theta_to_red_theta
    from mpc_via_diffusion_model_tpu.eval.plotting import plot_closed_loop_comparison, save_fig
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig
    from mpc_via_diffusion_model_tpu.train import ExperimentConfig, load_checkpoint

    ds = ControlSequenceDataset.load(args.dataset)
    horizon = args.horizon or ds.n_support_points
    plant, cost = get_plant(args.plant)

    # model config from the run's args.yaml if colocated with the checkpoint
    args_yaml = os.path.join(os.path.dirname(os.path.dirname(args.checkpoint)), "args.yaml")
    if os.path.exists(args_yaml):
        cfg = ExperimentConfig.from_yaml(args_yaml)
        model_cfg, diff_cfg = cfg.model, cfg.diffusion
    else:
        from mpc_via_diffusion_model_tpu.train import DiffusionConfig, ModelConfig
        model_cfg = ModelConfig(state_dim=ds.state_dim, n_support_points=horizon,
                                context_dim=ds.condition_dim)
        diff_cfg = DiffusionConfig()

    model = TemporalUnet(
        state_dim=model_cfg.state_dim, n_support_points=model_cfg.n_support_points,
        unet_input_dim=model_cfg.unet_input_dim,
        dim_mults=UNET_DIM_MULTS[model_cfg.dim_mults_option],
        context_dim=model_cfg.context_dim, conditioning_type="default",
        cfg_indicator=model_cfg.cfg_indicator,
    )
    diffusion = GaussianDiffusion(
        schedule=make_schedule(diff_cfg.variance_schedule, diff_cfg.n_diffusion_steps),
        predict_epsilon=diff_cfg.predict_epsilon,
    )
    state, _ = load_checkpoint(args.checkpoint)
    params = state.ema_params  # inference uses the EMA model (reference behaviour)

    theta0 = args.x0_theta
    if plant.state_dim >= 5:
        x0 = jnp.array([args.x0_pos, 0.0, theta0, 0.0, float(theta_to_red_theta(theta0))])
    else:
        x0 = jnp.zeros(plant.state_dim).at[0].set(args.x0_pos).at[2].set(theta0)

    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, ds.normalizer.stats["inputs"], ds.normalizer.stats["condition"],
        plant, cost, horizon=horizon, n_steps=args.steps, w=args.w,
        n_diffusion_steps_without_noise=args.tail, n_candidates=args.n_candidates,
    ))

    # multi-modality: repeated runs from the same x0 (different keys)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.sampling_times)
    batched = jax.jit(jax.vmap(lambda k: loop(params, x0, k)))
    t0 = time.time()
    runs = batched(keys)
    jax.block_until_ready(runs.x_track)
    t_compile = time.time() - t0

    t0 = time.time()
    runs = batched(keys)
    jax.block_until_ready(runs.x_track)
    t_diffusion = time.time() - t0

    # expert NMPC with both basin kicks
    t0 = time.time()
    expert_runs = []
    for kick in (5.0, -5.0):
        nmpc = jax.jit(make_nmpc_closed_loop(
            plant, cost, ILQRConfig(horizon=horizon, n_iterations=30),
            n_steps=args.steps, u_init_scale=kick,
        ))
        expert_runs.append(nmpc(x0))
    jax.block_until_ready(expert_runs[-1].x_track)
    t_nmpc = time.time() - t0

    os.makedirs(args.results_dir, exist_ok=True)
    np.save(os.path.join(args.results_dir, "x_diffusion.npy"), np.asarray(runs.x_track))
    np.save(os.path.join(args.results_dir, "u_diffusion.npy"), np.asarray(runs.u_track))
    np.save(os.path.join(args.results_dir, "x_mpc.npy"), np.asarray(expert_runs[0].x_track))
    np.save(os.path.join(args.results_dir, "u_mpc.npy"), np.asarray(expert_runs[0].u_track))

    # parity + costs (first run vs positive-kick expert)
    one = jax.tree_util.tree_map(lambda a: a[0], runs)
    parity = track_parity(one, expert_runs[0])
    print("\n=== Performance Check (reference Diffusion_MPC_Inference.py:483-502) ===")
    for k, v in parity.items():
        print(f"  {k}: {v:.6f}")
    c_diff = float(np.sum(np.asarray(per_step_mpc_costs(plant, cost, one))))
    c_mpc = float(np.sum(np.asarray(per_step_mpc_costs(plant, cost, expert_runs[0]))))
    print(f"  total horizon-cost: diffusion {c_diff:.2f} vs NMPC {c_mpc:.2f}")
    modes = count_swing_modes(np.asarray(runs.x_track))
    print(f"  modality over {args.sampling_times} runs: {modes}")
    print(f"  Diffusion_total_time: {t_diffusion:.3f}s for {args.sampling_times} runs "
          f"({args.sampling_times * args.steps / t_diffusion:.0f} replans/s); "
          f"compile {t_compile:.1f}s")
    print(f"  NMPC_total_time: {t_nmpc:.3f}s (2 basins x {args.steps} solves)")

    fig = plot_closed_loop_comparison(
        [np.asarray(one.x_track), np.asarray(expert_runs[0].x_track)],
        [np.asarray(one.u_track), np.asarray(expert_runs[0].u_track)],
        labels=["diffusion", "nmpc"], dt=plant.dt,
    )
    save_fig(fig, os.path.join(args.results_dir, "comparison"))
    print(f"saved tracks + figure to {args.results_dir}")


if __name__ == "__main__":
    main()
