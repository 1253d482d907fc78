"""Best-of-K replanning on the panda ladder (VERDICT r3 next #3).

Cart-pole and quadrotor both showed that candidate selection at fixed
denoise depth recovers what depth gave up (artifacts/student_candidates:
1-eval K=4 -> 1.0004x; artifacts/quadrotor_candidates: K=16 -> CF 1.0).
This points the same study at the hardest plant: the 7-DoF RNE panda
students (artifacts/distilled_panda 3-eval, artifacts/distilled_panda_deep
2/1-eval), whose 1-eval K=1 ratio is 1.0872x expert — the worst residual
gap in the repo.

Every row uses ONE protocol — the distill_panda eval protocol (x0 = 0.3 rad
on all joints, 80 control steps, mean over the same 10 sampling seeds
PRNGKey(7)) — including the fused-DDIM-chain rows, which previously
reported a single-key episode sum beside the 10-seed XLA mean in one JSON
(VERDICT r3 weak #4). K candidates cost one batched U-Net pass per replan
plus K vmapped 128-step RNE rollouts for min-cost selection
(`control/runtime.py` n_candidates).

Writes artifacts/panda_candidates/report.json; with --bench also measures
the fused chain at K on the device (Hz rows) for the 1-eval student.

Reference match: the Panda efficiency study,
`/root/reference/scripts/Panda/efficiency_plot/box_plot.py:8-48` (quality
vs compute tradeoff), upgraded from box plots over sampling counts to
measured closed-loop cost at fixed depth x candidate width.
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
    p.add_argument("--teacher", default="artifacts/flagship_panda_rbd")
    p.add_argument("--student-dirs", nargs="+",
                   default=["artifacts/distilled_panda",
                            "artifacts/distilled_panda_deep"])
    p.add_argument("--max-evals", type=int, default=3)
    p.add_argument("--out", default="artifacts/panda_candidates")
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--candidates", type=int, nargs="+", default=[1, 4, 16])
    p.add_argument("--selection-horizons", type=int, nargs="+",
                   default=[0, 16],
                   help="candidate-scoring rollout depths (0 = full horizon "
                        "+ terminal). Panda plan TAILS run ~9x the expert's "
                        "open-loop cost (flagship_panda_rbd "
                        "horizon_diagnosis.json) while only u[0] is applied, "
                        "so full-horizon argmin ranks candidates by tail "
                        "noise — truncated scoring "
                        "(control/runtime.py selection_horizon) ranks by "
                        "the credible prefix instead")
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--eval-seeds", type=int, default=10)
    p.add_argument("--bench", action="store_true",
                   help="also time the fused DDIM chain at each K for the "
                        "1-eval student (device Hz rows)")
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
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, make_panda_context
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS

    os.makedirs(args.out, exist_ok=True)
    plant, cost = get_plant("panda")
    to_cond = make_panda_context()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    flagship_report = json.load(open(os.path.join(args.teacher, "report.json")))
    expert_cost = flagship_report["closed_loop_cost_nmpc"]
    teacher_cost = flagship_report["closed_loop_cost_diffusion_mean10"]

    model = TemporalUnet(
        state_dim=7, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=20, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    x0 = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])
    eval_keys = jax.random.split(jax.random.PRNGKey(7), args.eval_seeds)

    def eval_10seed(loop, params):
        runs = jax.jit(jax.vmap(lambda k: loop(params, x0, k)))(eval_keys)
        costs = np.asarray(runs.stage_costs.sum(axis=1))
        return costs

    report = {"expert_closed_loop_cost": expert_cost,
              "teacher_closed_loop_cost_mean10": teacher_cost,
              "protocol": "x0=0.3rad, 80 steps, mean over 10 seeds "
                          "PRNGKey(7) — distill_panda.py eval protocol",
              "steps": args.steps, "eval_seeds": args.eval_seeds, "rows": []}

    one_eval_entry = None  # (params, times) of the 1-eval student for --bench
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
            if n_ev == 1:
                one_eval_entry = (params, times, art)
            sampler = make_student_ddim_sampler(schedule, model.apply, times)
            for K in args.candidates:
                sel_hs = [0] if K == 1 else args.selection_horizons
                for sel_h in sel_hs:
                    override = lambda ctx, key, K=K: sampler(
                        params, ctx, key, (K, args.horizon, 7))
                    loop = jax.jit(make_closed_loop(
                        diffusion, model.apply, ds.normalizer.stats["inputs"],
                        ds.normalizer.stats["condition"], plant, cost,
                        horizon=args.horizon, n_steps=args.steps,
                        n_candidates=K, sample_override=override,
                        state_to_condition=to_cond,
                        selection_horizon=sel_h or None))
                    costs = eval_10seed(loop, params)
                    row = {
                        "artifact": art, "n_evals": n_ev, "K": K,
                        "selection_horizon": sel_h or args.horizon,
                        "cost_mean": float(costs.mean()),
                        "cost_std": float(costs.std()),
                        "ratio_vs_expert": round(
                            float(costs.mean()) / expert_cost, 4),
                        "ratio_vs_teacher": round(
                            float(costs.mean()) / teacher_cost, 4),
                    }
                    report["rows"].append(row)
                    print(json.dumps(row), flush=True)
                    # incremental write: H=128 RNE compiles are minutes each
                    # on the remote TPU — keep partial results if the queue
                    # times out
                    with open(os.path.join(args.out, "report.json"), "w") as f:
                        json.dump(report, f, indent=2)

    # fused DDIM chain at K: SAME 10-seed protocol for cost + Hz rows
    if args.bench and one_eval_entry is not None:
        from mpc_via_diffusion_model_tpu.eval.timing import pipelined_time_fn
        from mpc_via_diffusion_model_tpu.ops.fused_denoise import (
            make_fused_ddim_chain,
        )
        params, times, art = one_eval_entry
        key = jax.random.PRNGKey(3)
        bench_sel_h = max(args.selection_horizons)  # truncated if swept
        for K in args.candidates:
            chain = make_fused_ddim_chain(model, params, schedule, times,
                                          n_samples=K)
            loop = jax.jit(make_closed_loop(
                diffusion, model.apply, ds.normalizer.stats["inputs"],
                ds.normalizer.stats["condition"], plant, cost,
                horizon=args.horizon, n_steps=args.steps,
                n_candidates=K, sample_override=chain,
                state_to_condition=to_cond,
                selection_horizon=(bench_sel_h or None) if K > 1 else None))
            # the K=16 H=128 chain kernel needs ~62.5M of scoped VMEM stack;
            # the 16M default is a compiler safety cap, not hardware (v5e
            # VMEM is 128M) — raise it per-compile for the big K. Keep each
            # K crash-proof so one failed compile doesn't lose the others.
            try:
                opts = ({"xla_tpu_scoped_vmem_limit_kib": 98304}
                        if K >= 8 else None)
                call = loop.lower(params, x0, eval_keys[0]).compile(
                    compiler_options=opts)
            except Exception as e:  # noqa: BLE001 — record and continue
                report[f"fused_chain_k{K}"] = {"error": str(e)[:400]}
                print(f"[bench] K={K} compile failed: {str(e)[:200]}",
                      flush=True)
                continue
            # sequential seeds, NOT eval_10seed's vmap: vmapping 10 programs
            # over the K=16 H=128 fused pallas chain exceeds the 16M scoped
            # VMEM stack at compile (measured: 37.5M, round 4)
            costs = np.asarray([
                float(call(params, x0, k).stage_costs.sum())
                for k in eval_keys])
            dt = pipelined_time_fn(
                lambda kk: call(params, x0, kk).x_track,
                [(jax.random.fold_in(key, i),) for i in range(8)])
            row = {
                "metric": f"panda_1eval_fused_chain_k{K}_hz",
                "value": round(args.steps / dt, 1), "unit": "Hz",
                "artifact": art,
                "selection_horizon": (bench_sel_h or args.horizon)
                                     if K > 1 else args.horizon,
                "cost_mean10": float(costs.mean()),
                "ratio_vs_expert": round(float(costs.mean()) / expert_cost, 4),
            }
            report[f"fused_chain_k{K}"] = row
            print(json.dumps(row), flush=True)
            with open(os.path.join(args.out, "report.json"), "w") as f:
                json.dump(report, f, indent=2)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
