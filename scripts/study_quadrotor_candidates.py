"""Collision-aware best-of-K replanning for the quadrotor students.

`study_student_candidates.py` showed min-cost candidate selection collapses
the cart-pole students' residual COST gap. Here the selection metric is the
quadrotor TASK cost (hover quadratic + soft obstacle penalty,
`quadrotor_task.make_task_cost`), so best-of-K is a SAFETY knob: each replan
draws K candidate horizons from the student in ONE batched U-Net pass,
rolls each through the plant, and applies the plan with the lowest
obstacle-penalized rollout cost (`control/runtime.py` `n_candidates`
min-cost selection — the same mechanism the reference's inference loop
exposes via its candidate batch, `Diffusion_MPC_Inference.py:195-258`,
which it only ever scores with the quadratic cost).

Evaluated on the 64-start held-out set (seed 97) shared with
`eval_quadrotor_policies.py`, so K=1 rows should reproduce wide_eval.json.

Writes <out>/report.json. Usage:
    python scripts/study_quadrotor_candidates.py [--cpu] [--quick]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import pickle

from quadrotor_task import (
    eval_start_states, make_select_cost, make_task_cost, track_metrics,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--guided-dir", default="artifacts/distilled_quadrotor_guided")
    p.add_argument("--deep-dir", default="artifacts/distilled_quadrotor_deep_cpu")
    p.add_argument("--out", default="artifacts/quadrotor_candidates")
    p.add_argument("--n-starts", type=int, default=64)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--candidates", type=int, nargs="+", default=[1, 4, 16])
    p.add_argument("--margin", type=float, default=0.15)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="8 starts, K in {1,4} (smoke)")
    args = p.parse_args()
    if args.quick:
        args.n_starts, args.candidates = 8, [1, 4]

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
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS

    plant, quad_cost = get_plant("quadrotor")
    # selection uses the margin-inflated safety cost (see make_select_cost:
    # raw task-cost selection picks grazing plans and LOWERS CF at K=4)
    cost = make_select_cost(quad_cost, margin=args.margin)
    H = 48
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    model = TemporalUnet(state_dim=4, n_support_points=H, unet_input_dim=32,
                         dim_mults=UNET_DIM_MULTS[0], context_dim=12,
                         conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    # (label, artifact dir, student file, DDIM time grid)
    students = []
    g_report = json.load(open(os.path.join(args.guided_dir, "report.json")))
    for rd in g_report["rounds"]:
        if rd["n_evals"] == 3:
            students.append(("guided_3eval", args.guided_dir,
                             f"student_{rd['n_evals']}eval.pkl", rd["times"]))
    d_report = json.load(open(os.path.join(args.deep_dir, "report.json")))
    for rd in d_report["rounds"]:
        students.append((f"deep_{rd['n_evals']}eval", args.deep_dir,
                         f"student_{rd['n_evals']}eval.pkl", rd["times"]))

    ev_j = jnp.asarray(eval_start_states(args.n_starts, seed=97))
    ks = jax.random.split(jax.random.PRNGKey(29), args.n_starts)

    rows = []
    for label, art_dir, fname, times in students:
        with open(os.path.join(art_dir, fname), "rb") as f:
            params = pickle.load(f)
        sampler = make_student_ddim_sampler(schedule, model.apply, times)
        for K in args.candidates:
            override = lambda ctx, key, K=K: sampler(params, ctx, key, (K, H, 4))
            loop = jax.jit(make_closed_loop(
                diffusion, model.apply, in_stats, c_stats, plant, cost,
                horizon=H, n_steps=args.steps, n_candidates=K,
                sample_override=override))
            runs = jax.jit(jax.vmap(lambda x0, k: loop(params, x0, k)))(ev_j, ks)
            row = {"policy": label, "n_evals": len(times), "K": K,
                   **track_metrics(runs.x_track)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump({"n_starts": args.n_starts, "steps": args.steps,
                   "selection_cost": f"margin-inflated safety cost (margin={args.margin}, weight=2e5)",
                   "rows": rows}, f, indent=2)
    print("wrote", os.path.join(args.out, "report.json"))


if __name__ == "__main__":
    main()
