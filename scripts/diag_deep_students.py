"""Per-seed diagnosis of the deep-distillation ladders (VERDICT r3 weak #2).

The full-budget TPU rerun of `distill_flagship.py --init-student ...`
(artifacts/distilled_deep, 30k steps/round) reported a WORSE 10-seed mean
cost ratio than the outage-era 1k-step CPU run (backed up at
artifacts/distilled_deep_cpu): 1.0192/1.0165 vs 1.0097/1.0119. Both runs
share cost_min ~ 329.6k (= expert basin) and cost_max ~ 361k, and the mean
difference (~3,100) is almost exactly one seed's worth of basin gap
(31k / 10 seeds) — suggesting the metric is a BIMODAL basin-count statistic
quantized at 0.95%/seed, not a smooth quality measure.

This script settles it: for each (ladder, student) it

1. reproduces the report's exact 10-seed protocol
   (`jax.random.split(PRNGKey(11), 10)`, 80 steps, bench x0) and prints the
   per-seed costs, and
2. widens to --wide-seeds fresh seeds (PRNGKey(1234)) so the basin-flip
   probability per ladder is estimated instead of sampled at n=10,

then classifies each seed as expert-basin (cost < threshold) or bad-basin
and writes artifacts/distilled_deep/diagnosis.json with the verdict fields
(basin counts, wide means, which ladder wins at n=wide).

The bad basin is real physics, not a bug: the swing-up task is bimodal
(see artifacts/flagship_modality) and a sampled left-swing plan from the
bench x0 costs ~361k vs ~330k — the student inherits the teacher's mode
mixture, and one DDIM init in ~10 lands in the expensive mode. Best-of-K
candidate selection removes it entirely (artifacts/student_candidates:
K=4 -> 1.0004x), which is the production answer.

Usage: python scripts/diag_deep_students.py [--cpu] [--wide-seeds 50]
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
    p.add_argument("--ladders", nargs="+",
                   default=["artifacts/distilled_deep",
                            "artifacts/distilled_deep_cpu"])
    p.add_argument("--out", default="artifacts/distilled_deep/diagnosis.json")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--wide-seeds", type=int, default=50)
    p.add_argument("--basin-threshold", type=float, default=345000.0,
                   help="costs above this are the left-swing (bad) basin; "
                        "the two modes sit at ~330k and ~361k")
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

    n_eval_steps = 80
    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
    nmpc = jax.jit(make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=args.horizon, n_iterations=25),
        n_steps=n_eval_steps, u_init_scale=5.0, warm_start=False))
    expert_cost = float(np.asarray(nmpc(x0).stage_costs).sum())
    print(f"[expert] cost {expert_cost:.1f}", flush=True)

    # the report's exact seeds, plus a disjoint wide set
    keys10 = jax.random.split(jax.random.PRNGKey(11), 10)
    keys_wide = jax.random.split(jax.random.PRNGKey(1234), args.wide_seeds)

    def eval_costs(params, times, keys):
        sampler = make_student_ddim_sampler(schedule, model.apply, times)
        override = lambda ctx, key: sampler(params, ctx, key,
                                            (1, args.horizon, 1))
        loop = jax.jit(make_closed_loop(
            diffusion, model.apply, ds.normalizer.stats["inputs"],
            ds.normalizer.stats["condition"], plant, cost,
            horizon=args.horizon, n_steps=n_eval_steps,
            sample_override=override))
        runs = jax.jit(jax.vmap(lambda k: loop(params, x0, k)))(keys)
        return np.asarray(runs.stage_costs.sum(axis=1))

    thr = args.basin_threshold
    out = {"expert_cost": expert_cost, "basin_threshold": thr,
           "wide_seeds": args.wide_seeds, "ladders": {}}
    for art in args.ladders:
        with open(os.path.join(art, "report.json")) as f:
            report = json.load(f)
        lad = {}
        for rd in report["rounds"]:
            n_ev, times = rd["n_evals"], rd["times"]
            with open(os.path.join(art, f"student_{n_ev}eval.pkl"), "rb") as f:
                params = pickle.load(f)
            c10 = eval_costs(params, times, keys10)
            cw = eval_costs(params, times, keys_wide)
            rec = {
                "times": times,
                "report_cost_mean": rd["cost_mean"],
                "repro_cost_mean_10": float(c10.mean()),
                "per_seed_costs_10": [round(float(c), 1) for c in c10],
                "bad_basin_count_10": int((c10 > thr).sum()),
                "wide_mean": float(cw.mean()),
                "wide_ratio": float(cw.mean() / expert_cost),
                "wide_median_ratio": float(np.median(cw) / expert_cost),
                "bad_basin_count_wide": int((cw > thr).sum()),
                "bad_basin_rate_wide": float((cw > thr).mean()),
                "expert_basin_mean_ratio": float(
                    cw[cw <= thr].mean() / expert_cost) if (cw <= thr).any()
                    else None,
                "bad_basin_mean": float(cw[cw > thr].mean())
                    if (cw > thr).any() else None,
            }
            lad[f"{n_ev}eval"] = rec
            print(json.dumps({"ladder": art, "student": f"{n_ev}eval",
                              **{k: rec[k] for k in (
                                  "report_cost_mean", "repro_cost_mean_10",
                                  "bad_basin_count_10", "wide_ratio",
                                  "bad_basin_rate_wide",
                                  "expert_basin_mean_ratio")}}), flush=True)
        out["ladders"][art] = lad

    # verdict: does basin count alone explain the report delta?
    dd = out["ladders"].get("artifacts/distilled_deep", {})
    dc = out["ladders"].get("artifacts/distilled_deep_cpu", {})
    if dd and dc:
        out["verdict"] = {
            "basin_gap_per_seed_pct": round(100 * (361000 - 330000)
                                            / expert_cost / 10, 2),
            "delta_2eval_10seed_explained_by_basin_flips":
                dd["2eval"]["bad_basin_count_10"]
                - dc["2eval"]["bad_basin_count_10"],
            "delta_1eval_10seed_explained_by_basin_flips":
                dd["1eval"]["bad_basin_count_10"]
                - dc["1eval"]["bad_basin_count_10"],
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out.get("verdict", {}), indent=2), flush=True)


if __name__ == "__main__":
    main()
