"""Quadrotor guide Pareto sweep: guide_scale x t_start_guide, on-device.

VERDICT r2 #4: the flagship's guide buys collision-freedom (CF 0.94 vs 0.63
unguided) but gives up goal reach, so the COMBINED safe-reach metric
(collision-free AND final position within 0.5 m of the goal) was below the
expert's 0.56 at the two scales measured. This sweeps the full
(guide_scale, t_start_guide) grid to map the frontier and pick an operating
point.

TPU-shaped: the guide knobs are RUNTIME scalars (the sampler's
``i < t_start_guide`` gate and the guide's descent step both trace them), so
the ENTIRE grid x starts sweep is ONE jitted program — grid points and eval
starts are two vmap axes, which also batches the guide's rollout-gradient
tiny-op chains across the whole sweep (the per-loop guided path is
op-latency-bound at batch 1, BENCH.md).

Writes artifacts/quadrotor_pareto/{report.json, frontier.png}.
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

# task definition shared with every quadrotor script (quadrotor_task.py)
from quadrotor_task import (
    eval_start_states, make_penalty_grad, make_task_cost, min_clearance,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--out", default="artifacts/quadrotor_pareto")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--eval-starts", type=int, default=16)
    p.add_argument("--scales", type=float, nargs="+",
                   default=[0.02, 0.05, 0.1, 0.2])
    p.add_argument("--t-starts", type=float, nargs="+",
                   default=[6.25, 12.5, 30.0])
    p.add_argument("--cpu", action="store_true")
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

    os.makedirs(args.out, exist_ok=True)
    plant, quad_cost = get_plant("quadrotor")
    task_cost = make_task_cost(quad_cost)

    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    with open(os.path.join(args.teacher, "ema_params.pkl"), "rb") as f:
        params = pickle.load(f)
    model = TemporalUnet(state_dim=4, n_support_points=args.horizon,
                         unet_input_dim=32, dim_mults=UNET_DIM_MULTS[0],
                         context_dim=12, conditioning_type="default",
                         cfg_indicator=True)
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    u_stats = ds.normalizer.stats["inputs"]

    # eval starts: the flagship's held-out set
    ev_j = jnp.asarray(eval_start_states(args.eval_starts))
    ks = jax.random.split(jax.random.PRNGKey(11), args.eval_starts)

    def run_one(x0, key, scale, t_start):
        """One guided closed loop with RUNTIME (scale, t_start) — traced, so
        the whole grid is one compile."""

        # the shared penalty-gradient guide with the TRACED scale closed over
        per = make_penalty_grad(plant, u_stats, scale)

        def guide_builder(x0_inner):
            def guide(u_norm_batch):
                return jax.vmap(lambda u: per(u, x0_inner))(u_norm_batch)

            return guide

        loop = make_closed_loop(
            diffusion, model.apply, u_stats, ds.normalizer.stats["condition"],
            plant, task_cost, horizon=args.horizon, n_steps=args.steps,
            w=0.01, n_diffusion_steps_without_noise=5,
            guide_builder=guide_builder, n_guide_steps=1, t_start_guide=t_start)
        res = loop(params, x0, key)
        return res.x_track, res.stage_costs

    # vmap over starts, then over the grid
    per_grid = jax.vmap(run_one, in_axes=(0, 0, None, None))
    sweep = jax.jit(jax.vmap(per_grid, in_axes=(None, None, 0, 0)))

    grid = [(s, t) for s in args.scales for t in args.t_starts]
    scales = jnp.asarray([g[0] for g in grid], jnp.float32)
    t_starts = jnp.asarray([g[1] for g in grid], jnp.float32)

    t0 = time.time()
    xts, costs = sweep(ev_j, ks, scales, t_starts)
    xts = np.asarray(xts)          # (G, N, steps+1, 12)
    costs = np.asarray(costs)      # (G, N, steps)
    t_sweep = time.time() - t0
    print(f"[sweep] {len(grid)} grid points x {args.eval_starts} starts in "
          f"{t_sweep:.1f}s", flush=True)

    clearance = min_clearance(xts)  # (G, N)
    goal_dist = np.linalg.norm(xts[:, :, -1, 0:3], axis=-1)          # (G, N)
    cf = clearance > 0
    reach = goal_dist < 0.5
    rows = []
    for gi, (s, t) in enumerate(grid):
        rows.append({
            "guide_scale": s, "t_start_guide": t,
            "collision_free_fraction": float(cf[gi].mean()),
            "goal_reach_fraction_0.5": float(reach[gi].mean()),
            "safe_reach_fraction": float((cf[gi] & reach[gi]).mean()),
            "min_clearance_mean": float(clearance[gi].mean()),
            "goal_dist_mean": float(goal_dist[gi].mean()),
            "cost_mean": float(costs[gi].sum(axis=1).mean()),
        })
        print(json.dumps(rows[-1]), flush=True)

    # operating point: max safe-reach, CF >= 0.9 preferred
    safe = [r for r in rows if r["collision_free_fraction"] >= 0.9]
    pool = safe if safe else rows
    best = max(pool, key=lambda r: (r["safe_reach_fraction"],
                                    r["collision_free_fraction"]))
    report = {
        "grid": rows,
        "chosen": best,
        "sweep_seconds": round(t_sweep, 1),
        "expert_safe_reach": 0.5625,  # flagship report
        "note": ("one jitted program: grid and starts are vmap axes; "
                 "guide knobs are runtime scalars"),
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("[chosen]", json.dumps(best), flush=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpc_via_diffusion_model_tpu.eval.plotting import save_fig

    fig, ax = plt.subplots(figsize=(6.4, 5.2))
    for t in sorted(set(args.t_starts)):
        pts = [(r["collision_free_fraction"], r["goal_reach_fraction_0.5"],
                r["guide_scale"]) for r in rows if r["t_start_guide"] == t]
        pts.sort()
        ax.plot([p[0] for p in pts], [p[1] for p in pts], "o-",
                label=f"t_start={t}")
        for x, y, s in pts:
            ax.annotate(f"{s}", (x, y), fontsize=7,
                        textcoords="offset points", xytext=(4, 4))
    ax.axhline(1.0, color="gray", lw=0.5)
    ax.scatter([best["collision_free_fraction"]],
               [best["goal_reach_fraction_0.5"]], marker="*", s=220,
               color="crimson", zorder=5, label="chosen")
    ax.set_xlabel("collision-free fraction")
    ax.set_ylabel("goal-reach fraction (<0.5 m)")
    ax.set_title("quadrotor guide Pareto (labels = guide_scale)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    save_fig(fig, os.path.join(args.out, "frontier"))
    print("artifacts in", args.out, flush=True)


if __name__ == "__main__":
    main()
