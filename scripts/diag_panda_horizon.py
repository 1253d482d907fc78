"""Panda horizon-consistency diagnostic (VERDICT r3 weak #6 / next #6).

flagship_panda_rbd reports closed-loop cost within 3.1% of the iLQR expert
but sampled-horizon open-loop cost 9x the expert's
(horizon_cost_diffusion_mean10 201,605 vs horizon_cost_nmpc 22,481). This
script decomposes that 9x along the horizon and tests the two candidate
explanations:

1. PER-STEP DECAY: for each replan step t of one diffusion closed loop,
   roll the sampled horizon u_horizons[t] open-loop from the visited state
   x_track[t] and record the cumulative stage cost at each depth k; solve
   iLQR from the same state for the expert's curve. If the ratio is ~1 at
   small k and grows with k, the gap is open-loop error COMPOUNDING in the
   plan tail — invisible to receding-horizon control (only u[0] is applied,
   reference protocol `Diffusion_MPC_Inference.py:195-258`) and expected
   from behavior cloning; if the ratio is large already at k=1, the model
   is producing bad immediate controls and the 3.1% closed loop is luck.

2. COVERAGE: normalized condition-space distance of each visited state to
   its nearest dataset sample, against the dataset's own nearest-neighbor
   distance distribution. If visited states sit far outside the data, the
   tail divergence is a coverage defect fixable by on-policy augmentation;
   if they sit inside, it is not.

Writes artifacts/flagship_panda_rbd/horizon_diagnosis.json.

Reference match: `calMPCCost` horizon scoring,
`/root/reference/scripts/inference/Cart_Diffusion_inference.py:247-283`.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_panda_rbd")
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--depths", type=int, nargs="+",
                   default=[1, 2, 4, 8, 16, 32, 64, 128])
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
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, make_panda_context
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig
    from mpc_via_diffusion_model_tpu.solvers.ilqr import ilqr_solve
    from mpc_via_diffusion_model_tpu.train import load_checkpoint

    plant, cost = get_plant("panda")
    to_cond = make_panda_context()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    state, _ = load_checkpoint(os.path.join(args.teacher, "checkpoints",
                                            "final.ckpt"))
    params = jax.device_get(state.ema_params)

    H = args.horizon
    model = TemporalUnet(
        state_dim=7, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=20,
        conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    x0 = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])
    loop = jax.jit(make_closed_loop(
        diffusion, model.apply, ds.normalizer.stats["inputs"],
        ds.normalizer.stats["condition"], plant, cost,
        horizon=H, n_steps=args.steps, w=0.01,
        n_diffusion_steps_without_noise=5, state_to_condition=to_cond))
    run = loop(params, x0, jax.random.PRNGKey(7))
    xs = run.x_track[:-1]          # (T, 14) visited states
    u_hors = run.u_horizons        # (T, H, 7) sampled plans

    # cumulative open-loop cost curve of a plan from a state
    def cum_costs(x0v, u_seq):
        def body(carry, u):
            x, acc = carry
            acc = acc + cost.stage(x, u)
            return (plant.step(x, u), acc), acc

        (_, _), curve = jax.lax.scan(body, (x0v, jnp.float32(0.0)), u_seq)
        return curve  # (H,) cumulative cost after k+1 steps

    diff_curves = jax.jit(jax.vmap(cum_costs))(xs, u_hors)  # (T, H)

    # iLQR expert plan from each visited state (the per-state oracle)
    cfg = ILQRConfig(horizon=H, n_iterations=25)
    u_ws = jnp.zeros((H, plant.control_dim))

    def expert_curve(x0v):
        sol = ilqr_solve(plant, cost, x0v, u_ws, cfg)
        return cum_costs(x0v, sol.us)

    exp_curves = jax.jit(jax.vmap(expert_curve))(xs)  # (T, H)

    diff_np, exp_np = np.asarray(diff_curves), np.asarray(exp_curves)
    decay = {}
    for k in args.depths:
        r = diff_np[:, k - 1].mean() / max(exp_np[:, k - 1].mean(), 1e-9)
        decay[str(k)] = round(float(r), 4)
    print("[decay] cumulative diffusion/expert cost ratio by depth:",
          json.dumps(decay), flush=True)

    # coverage: normalized condition distance, visited vs dataset self-NN
    cn = np.asarray(ds.condition_normalized)
    sub = cn[np.random.RandomState(0).choice(len(cn), min(len(cn), 20000),
                                             replace=False)]
    vis = np.asarray(jax.vmap(lambda x: to_cond(x))(xs))
    from mpc_via_diffusion_model_tpu.data.normalization import normalize
    vis_n = np.asarray(jax.vmap(
        lambda c: normalize(ds.normalizer.stats["condition"], c))(
            jnp.asarray(vis)))

    def nn_dist(queries, pool):
        d = np.linalg.norm(queries[:, None] - pool[None], axis=-1)
        return d.min(axis=1)

    d_vis = nn_dist(vis_n, sub)
    self_idx = np.random.RandomState(1).choice(len(sub), 500, replace=False)
    d_self = np.array([
        np.delete(np.linalg.norm(sub - sub[i], axis=-1), i).min()
        for i in self_idx])
    coverage = {
        "visited_nn_dist_mean": round(float(d_vis.mean()), 4),
        "visited_nn_dist_max": round(float(d_vis.max()), 4),
        "dataset_self_nn_dist_mean": round(float(d_self.mean()), 4),
        "dataset_self_nn_dist_p99": round(float(np.quantile(d_self, 0.99)), 4),
    }
    print("[coverage]", json.dumps(coverage), flush=True)

    out = {
        "protocol": f"one closed loop (PRNGKey(7)), {args.steps} replans, "
                    f"horizon {H}; expert = iLQR(25 it) from each visited "
                    f"state",
        "cumulative_cost_ratio_by_depth": decay,
        "closed_loop_stage_cost_sum": round(
            float(np.asarray(run.stage_costs).sum()), 2),
        "coverage": coverage,
    }
    with open(os.path.join(args.teacher, "horizon_diagnosis.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
