"""Wide-eval of the quadrotor policies: guided teacher vs guided-data student.

16 starts gives +/-1-2-start noise on collision-free fraction; this evaluates
the guided TEACHER (sampling-time obstacle guide at the Pareto-chosen
operating point), the unguided teacher control arm, the guided-data
FINETUNED full-CFG model (when the distill run saved
guided_teacher_ema.pkl), and every distilled STUDENT on the same N held-out
starts so the distillation gap is measured, not guessed. Prints one JSON row
per policy; writes <student-dir>/wide_eval.json.
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
    eval_start_states, make_loop_guide_builder, make_task_cost, track_metrics,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--student-dir", default="artifacts/distilled_quadrotor_guided")
    p.add_argument("--n-starts", type=int, default=64)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--guide-scale", type=float, default=0.1)
    p.add_argument("--t-start-guide", type=float, default=6.25)
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
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS

    plant, quad_cost = get_plant("quadrotor")
    cost = make_task_cost(quad_cost)
    H = 48
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    with open(os.path.join(args.teacher, "ema_params.pkl"), "rb") as f:
        teacher_params = pickle.load(f)
    model = TemporalUnet(state_dim=4, n_support_points=H, unet_input_dim=32,
                         dim_mults=UNET_DIM_MULTS[0], context_dim=12,
                         conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    # fresh held-out starts (different seed from the 16-start eval)
    ev_j = jnp.asarray(eval_start_states(args.n_starts, seed=97))
    ks = jax.random.split(jax.random.PRNGKey(29), args.n_starts)

    metrics = track_metrics  # shared flagship metric definitions
    guide_builder = make_loop_guide_builder(plant, in_stats, args.guide_scale)

    out = {"n_starts": args.n_starts}

    # guided teacher
    gloop = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=H, n_steps=args.steps, w=0.01,
        n_diffusion_steps_without_noise=5,
        guide_builder=guide_builder, n_guide_steps=1,
        t_start_guide=args.t_start_guide))
    runs = jax.jit(jax.vmap(lambda x0, k: gloop(teacher_params, x0, k)))(ev_j, ks)
    out["teacher_guided"] = metrics(runs.x_track)
    print(json.dumps({"policy": "teacher_guided", **out["teacher_guided"]}),
          flush=True)

    # unguided teacher (control arm)
    uloop = jax.jit(make_closed_loop(
        diffusion, model.apply, in_stats, c_stats, plant, cost,
        horizon=H, n_steps=args.steps, w=0.01,
        n_diffusion_steps_without_noise=5))
    runs = jax.jit(jax.vmap(lambda x0, k: uloop(teacher_params, x0, k)))(ev_j, ks)
    out["teacher_unguided"] = metrics(runs.x_track)
    print(json.dumps({"policy": "teacher_unguided", **out["teacher_unguided"]}),
          flush=True)

    # guided-data FINETUNED full-CFG model (saved by the distill run)
    ft_path = os.path.join(args.student_dir, "guided_teacher_ema.pkl")
    if os.path.exists(ft_path):
        with open(ft_path, "rb") as f:
            ft_params = pickle.load(f)
        runs = jax.jit(jax.vmap(lambda x0, k: uloop(ft_params, x0, k)))(ev_j, ks)
        out["finetuned_full_cfg"] = metrics(runs.x_track)
        print(json.dumps({"policy": "finetuned_full_cfg",
                          **out["finetuned_full_cfg"]}), flush=True)
    else:
        print(json.dumps({"policy": "finetuned_full_cfg",
                          "skipped": f"{ft_path} not found (older distill run)"}),
              flush=True)

    # guided-data students
    report = json.load(open(os.path.join(args.student_dir, "report.json")))
    for rd in report["rounds"]:
        n_ev = rd["n_evals"]
        with open(os.path.join(args.student_dir, f"student_{n_ev}eval.pkl"),
                  "rb") as f:
            student = pickle.load(f)
        times = rd["times"]
        sampler = make_student_ddim_sampler(schedule, model.apply, times)
        override = lambda ctx, key: sampler(student, ctx, key, (1, H, 4))
        sloop = jax.jit(make_closed_loop(
            diffusion, model.apply, in_stats, c_stats, plant, cost,
            horizon=H, n_steps=args.steps, sample_override=override))
        runs = jax.jit(jax.vmap(lambda x0, k: sloop(student, x0, k)))(ev_j, ks)
        out[f"student_{n_ev}eval"] = metrics(runs.x_track)
        print(json.dumps({"policy": f"student_{n_ev}eval",
                          **out[f"student_{n_ev}eval"]}), flush=True)

    with open(os.path.join(args.student_dir, "wide_eval.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
