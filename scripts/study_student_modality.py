"""Multi-modality of the DISTILLED students: the SAMPLING_TIMES study re-run.

The reference's one-state multi-modality result (repeated closed loops from
the same x0 produce BOTH left and right swing-ups,
`Cart_Diffusion_inference.py:605-617`) was reproduced for the 25+5-step CFG
teacher in scripts/flagship_modality.py (artifacts/flagship_modality: 5/5
study states bimodal). This script asks whether progressive distillation
PRESERVES that conditional multi-modality or mode-collapses it: a k-eval
DDIM student is a deterministic map of its init noise, so both basins
survive only if the student keeps distinct noise->basin regions.

For every student recorded in the given artifact dirs (e.g. the 3-eval
round-2 student in artifacts/distilled and the 2-/1-eval deep students in
artifacts/distilled_deep), it runs SAMPLING_TIMES seeded closed loops at
the 5 teacher study states, counts left/right outcomes, and compares with
the teacher's committed counts. Writes <out>/report.json.

Usage: python scripts/study_student_modality.py [--cpu]
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
    p.add_argument("--out", default="artifacts/student_modality")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--sampling-times", type=int, default=20)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        count_swing_modes, make_closed_loop, per_step_mpc_costs,
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

    os.makedirs(args.out, exist_ok=True)
    plant, _ = get_plant("cartpole_virtual_swingup")
    cost = cartpole_virtual_collect_cost()  # same convention as the teacher study
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    model = TemporalUnet(
        state_dim=1, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=5, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    # the teacher study's exact states, taken FROM its committed report so
    # the student counts are compared at the states the teacher actually ran
    # (falls back to the flagship_modality.py list if the report is absent)
    teacher_study = {}
    t_report = os.path.join(args.teacher, "report.json")
    if os.path.exists(t_report):
        with open(t_report) as f:
            teacher_study = {r["name"]: r for r in json.load(f)["study"]}
    if teacher_study:
        study_x0 = [{"name": r["name"], "pos": r["pos"], "theta": r["theta"]}
                    for r in teacher_study.values()]
    else:
        study_x0 = [
            {"name": "pos0.0_theta_pi", "pos": 0.0, "theta": float(np.pi)},
            {"name": "pos0.25_theta_pi", "pos": 0.25, "theta": float(np.pi)},
            {"name": "pos-0.25_theta_pi", "pos": -0.25, "theta": float(np.pi)},
            {"name": "pos0.0_theta_3.0", "pos": 0.0, "theta": 3.0},
            {"name": "pos0.0_theta_3.3", "pos": 0.0, "theta": 3.3},
        ]

    mpc_cost_total = jax.jit(
        lambda r: jnp.sum(per_step_mpc_costs(plant, cost, r)))
    mpc_cost_batch = jax.jit(jax.vmap(mpc_cost_total))

    report = {"sampling_times": args.sampling_times, "students": []}
    for art in args.student_dirs:
        with open(os.path.join(art, "report.json")) as f:
            rounds = json.load(f)["rounds"]
        for rd in rounds:
            n_ev, times = rd["n_evals"], rd["times"]
            pkl = os.path.join(art, f"student_{n_ev}eval.pkl")
            if not os.path.exists(pkl):
                continue
            with open(pkl, "rb") as f:
                params = pickle.load(f)
            sampler = make_student_ddim_sampler(schedule, model.apply, times)
            override = lambda ctx, key: sampler(params, ctx, key,
                                                (1, args.horizon, 1))
            loop = jax.jit(make_closed_loop(
                diffusion, model.apply, ds.normalizer.stats["inputs"],
                ds.normalizer.stats["condition"], plant, cost,
                horizon=args.horizon, n_steps=args.steps,
                sample_override=override,
            ))
            runs_fn = jax.jit(jax.vmap(lambda k, x0: loop(params, x0, k),
                                       in_axes=(0, None)))
            rows, bimodal = [], 0
            for i, entry in enumerate(study_x0):
                x0 = jnp.array([entry["pos"], 0.0, entry["theta"], 0.0,
                                float(theta_to_red_theta(entry["theta"]))])
                keys = jax.random.split(jax.random.PRNGKey(7 + i),
                                        args.sampling_times)
                runs = runs_fn(keys, x0)
                modes = count_swing_modes(np.asarray(runs.x_track))
                costs = np.asarray(mpc_cost_batch(runs))
                t_rec = teacher_study.get(entry["name"], {})
                rows.append({
                    **entry, **modes,
                    "teacher_left": t_rec.get("left"),
                    "teacher_right": t_rec.get("right"),
                    "cost_mean": float(costs.mean()),
                })
                bimodal += int(modes["left"] > 0 and modes["right"] > 0)
                print(f"[{art} {n_ev}-eval] {entry['name']}: "
                      f"left={modes['left']} right={modes['right']} "
                      f"(teacher {t_rec.get('left')}/{t_rec.get('right')})",
                      flush=True)
            report["students"].append({
                "artifact": art, "n_evals": n_ev, "times": times,
                "bimodal_states": bimodal, "n_states": len(study_x0),
                "rows": rows,
            })

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps([{k: s[k] for k in
                       ("artifact", "n_evals", "bimodal_states", "n_states")}
                      for s in report["students"]], indent=2), flush=True)


if __name__ == "__main__":
    main()
