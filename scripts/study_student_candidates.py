"""Best-of-K replanning with the distilled students: quality vs candidates.

The deep students (artifacts/distilled_deep) trade denoise depth for
latency: the 1-eval student runs one U-Net pass per replan at ~1.012x the
expert's closed-loop cost. This study measures the OTHER axis the fused
runtime already exposes — `n_candidates` min-cost selection
(`control/runtime.py:92-157`, BASELINE config #4): sample K candidate
horizons per replan (ONE batched U-Net pass, near-free on the MXU at these
sizes), roll each through the plant, apply the cheapest. Shows whether
candidate search at fixed 1-eval depth recovers the deep students' residual
gap vs the expert.

Writes <out>/report.json with cost ratios per (student, K) over seeded runs.

Usage: python scripts/study_student_candidates.py [--cpu]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_modality")
    p.add_argument("--student-dirs", nargs="+",
                   default=["artifacts/distilled", "artifacts/distilled_deep"])
    p.add_argument("--max-evals", type=int, default=3,
                   help="only study students at <= this many U-Net evals "
                        "(the deep/fast regime where candidates matter)")
    p.add_argument("--out", default="artifacts/student_candidates")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--candidates", type=int, nargs="+", default=[1, 4, 16, 64])
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        make_closed_loop, make_nmpc_closed_loop,
    )
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_collect_cost, get_plant, theta_to_red_theta,
    )
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig

    os.makedirs(args.out, exist_ok=True)
    plant, _ = get_plant("cartpole_virtual_swingup")
    cost = cartpole_virtual_collect_cost()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    model = TemporalUnet(
        state_dim=1, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=5, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
    nmpc = jax.jit(make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=args.horizon, n_iterations=25),
        n_steps=args.steps, u_init_scale=5.0, warm_start=False))
    expert_cost = float(np.asarray(nmpc(x0).stage_costs).sum())
    keys = jax.random.split(jax.random.PRNGKey(11), args.seeds)

    report = {"expert_cost": expert_cost, "steps": args.steps,
              "seeds": args.seeds, "rows": []}
    for art in args.student_dirs:
        with open(os.path.join(art, "report.json")) as f:
            rounds = json.load(f)["rounds"]
        for rd in rounds:
            n_ev, times = rd["n_evals"], rd["times"]
            if n_ev > args.max_evals:
                continue
            pkl = os.path.join(art, f"student_{n_ev}eval.pkl")
            if not os.path.exists(pkl):
                continue
            with open(pkl, "rb") as f:
                params = pickle.load(f)
            sampler = make_student_ddim_sampler(schedule, model.apply, times)
            for K in args.candidates:
                # the runtime hands the override a (K, dx) broadcast context
                # (control/runtime.py:102-105)
                override = lambda ctx, key, K=K: sampler(
                    params, ctx, key, (K, args.horizon, 1))
                loop = jax.jit(make_closed_loop(
                    diffusion, model.apply, ds.normalizer.stats["inputs"],
                    ds.normalizer.stats["condition"], plant, cost,
                    horizon=args.horizon, n_steps=args.steps,
                    n_candidates=K, sample_override=override,
                ))
                runs = jax.jit(jax.vmap(lambda k: loop(params, x0, k)))(keys)
                costs = np.asarray(runs.stage_costs.sum(axis=1))
                row = {
                    "artifact": art, "n_evals": n_ev, "K": K,
                    "cost_mean": float(costs.mean()),
                    "cost_min": float(costs.min()),
                    "cost_max": float(costs.max()),
                    "ratio_mean": float(costs.mean() / expert_cost),
                    "ratio_max": float(costs.max() / expert_cost),
                }
                report["rows"].append(row)
                print(json.dumps(row), flush=True)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
