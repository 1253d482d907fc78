"""Benchmark deeply-distilled flagship students (2-eval / 1-eval) on TPU.

Walks a distillation artifact dir (scripts/distill_flagship.py --out ...;
the deep grids come from --init-student resume, e.g. [23,15,7] -> [23,7]
-> [23]) and, for every round recorded in its report.json, runs the
student through the whole-EPISODE Pallas kernel
(`ops.fused_episode.make_fused_ddim_episode`) at:

- the 80-step protocol with pipelined dispatch (bench.py's headline shape),
- the sustained one-long-episode protocol (800 steps in ONE dispatch —
  the stable number, BENCH.md "Measurement note"),

and reports the closed-loop cost ratio vs the report's iLQR expert. One
JSON line per (student, protocol) row; all rows are also written to
<art>/bench.json so the doc-drift guard (scripts/check_claims.py) can pin
README/BENCH Hz numbers to a committed measurement.

Usage: python scripts/bench_deep_students.py --art artifacts/distilled_deep
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

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--art", default="artifacts/distilled_deep")
    p.add_argument("--teacher", default="artifacts/flagship_modality")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--steps", type=int, default=80,
                   help="protocol episode length (pipelined row)")
    p.add_argument("--sustained-steps", type=int, default=800)
    p.add_argument("--candidates", type=int, default=0,
                   help="if >1, add an in-kernel best-of-K sustained row per "
                        "student (artifacts/student_candidates: the 1-eval "
                        "student at K=4 matches the expert cost)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_collect_cost, get_plant, theta_to_red_theta,
    )
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.ops.fused_episode import make_fused_ddim_episode

    with open(os.path.join(args.art, "report.json")) as f:
        report = json.load(f)
    expert_cost = report["expert_cost"]

    plant, _ = get_plant("cartpole_virtual_swingup")
    cost = cartpole_virtual_collect_cost()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    model = TemporalUnet(
        state_dim=1, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=5, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
    key = jax.random.PRNGKey(0)

    bench = {"steps": args.steps, "sustained_steps": args.sustained_steps}

    def emit(row):
        bench[row["metric"]] = row["value"]
        bench[row["metric"] + "_extra"] = {
            k: v for k, v in row.items() if k not in ("metric", "value", "unit")}
        print(json.dumps(row), flush=True)

    # distill artifacts carry a rounds ladder; onpolicy fine-tune artifacts
    # (scripts/onpolicy_cartpole.py) a flat times key + study-style rows
    if "rounds" in report:
        rounds = report["rounds"]
    else:
        k1 = [r for r in report["rows"]
              if r["student"] == "onpolicy" and r["K"] == 1]
        k1.sort(key=lambda r: -r.get("n_seeds", 0))
        rounds = [{"times": report["times"],
                   "cost_ratio_vs_expert": k1[0]["ratio_mean"]}]

    for rec in rounds:
        times = rec["times"]
        pkl = os.path.join(args.art, f"student_{len(times)}eval.pkl")
        with open(pkl, "rb") as f:
            params = pickle.load(f)

        episode = jax.jit(make_fused_ddim_episode(
            model, params, schedule, times, in_stats, c_stats, plant, cost,
            n_steps=args.steps))
        jax.block_until_ready(episode(x0, key))
        dts = []
        for b in range(3):
            t0 = time.perf_counter()
            outs = [episode(x0, jax.random.fold_in(key, 50 * b + i))
                    for i in range(8)]
            jax.block_until_ready(outs)
            dts.append((time.perf_counter() - t0) / 8)
        _, _, costs = episode(x0, key)
        emit({
            "metric": f"deep_distilled_{len(times)}eval_fused_episode_hz",
            "value": round(args.steps / min(dts), 1), "unit": "Hz",
            "times": times,
            "cost_ratio_vs_expert": round(float(jnp.sum(costs)) / expert_cost, 4),
            "report_cost_ratio": round(rec["cost_ratio_vs_expert"], 4),
        })

        ep_long = jax.jit(make_fused_ddim_episode(
            model, params, schedule, times, in_stats, c_stats, plant, cost,
            n_steps=args.sustained_steps))
        jax.block_until_ready(ep_long(x0, key))
        reps = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(ep_long(x0, jax.random.fold_in(key, r)))
            reps.append(time.perf_counter() - t0)
        emit({
            "metric": f"deep_distilled_{len(times)}eval_sustained_hz",
            "value": round(args.sustained_steps / min(reps), 1), "unit": "Hz",
            "times": times,
        })

        if args.candidates > 1:
            K = args.candidates
            ep_k = jax.jit(make_fused_ddim_episode(
                model, params, schedule, times, in_stats, c_stats, plant,
                cost, n_steps=args.sustained_steps, n_candidates=K))
            jax.block_until_ready(ep_k(x0, key))
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                out = ep_k(x0, jax.random.fold_in(key, 100 + r))
                jax.block_until_ready(out)
                reps.append(time.perf_counter() - t0)
            _, _, costs_k = ep_k(x0, key)
            # cost over the sustained episode length, same expert protocol
            # scaling as the report (expert_cost is the 80-step sum)
            emit({
                "metric": f"deep_distilled_{len(times)}eval_k{K}_sustained_hz",
                "value": round(args.sustained_steps / min(reps), 1),
                "unit": "Hz", "times": times,
                "cost_ratio_vs_expert_80": round(
                    float(jnp.sum(costs_k[:args.steps])) / expert_cost, 4),
            })

    with open(os.path.join(args.art, "bench.json"), "w") as f:
        json.dump(bench, f, indent=2)


if __name__ == "__main__":
    main()
