"""Progressive distillation of the quadrotor CFG policy (second plant family).

Same recipe as scripts/distill_flagship.py (the machinery in
diffusion/distillation.py is plant-agnostic): the 25-step CFG quadrotor
teacher (artifacts/flagship_quadrotor) distills to conditional-only DDIM
students with 12 -> 6 -> 3 U-Net evals, guidance weight baked in.

``--guided`` additionally bakes the OBSTACLE COST-GRADIENT GUIDE into the
student (VERDICT r2 #3): the guide closes over the plant state x0, which is
exactly the student's conditioning context (ctx = normalize(x0)), so the
guided conditional distribution IS learnable by a context-conditioned
student. Round 1 adds the guide delta to every teacher DDIM sub-step under
t_start_guide (`make_distill_step(guide_fn=...)`, mirroring `ddpm_step`'s
post-step hook); the students run with NO guide at inference and are scored
against the GUIDED teacher's collision-free fraction. Without the flag the
original behavior (unguided targets, scored vs the unguided teacher).
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

from quadrotor_task import (
    eval_start_states, make_penalty_grad, make_task_cost, track_metrics,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--out", default="artifacts/distilled_quadrotor")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--w", type=float, default=0.01)
    p.add_argument("--steps-per-round", type=int, default=30000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--eval-starts", type=int, default=16)
    p.add_argument("--guided", action="store_true",
                   help="bake the obstacle cost-gradient guide into the "
                        "student (distill the GUIDED teacher)")
    p.add_argument("--guide-scale", type=float, default=0.1)
    p.add_argument("--t-start-guide", type=float, default=12.5)
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
        ddim_time_grid, make_distill_step, make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, quad_cost = get_plant("quadrotor")
    cost = make_task_cost(quad_cost)  # the flagship's hover + obstacle cost
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    with open(os.path.join(args.teacher, "ema_params.pkl"), "rb") as f:
        teacher_params = pickle.load(f)
    flagship_report = json.load(open(os.path.join(args.teacher, "report.json")))

    model = TemporalUnet(
        state_dim=4, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=12, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    # the flagship's 16 held-out eval starts
    n_eval_steps = 60
    ev_j = jnp.asarray(eval_start_states(args.eval_starts))
    ks = jax.random.split(jax.random.PRNGKey(11), args.eval_starts)

    def metrics(runs):
        return track_metrics(runs.x_track, runs.stage_costs)

    def eval_student(params, times):
        sampler = make_student_ddim_sampler(schedule, model.apply, times)
        override = lambda ctx, key: sampler(params, ctx, key, (1, args.horizon, 4))
        loop = jax.jit(make_closed_loop(
            diffusion, model.apply, ds.normalizer.stats["inputs"],
            ds.normalizer.stats["condition"], plant, cost,
            horizon=args.horizon, n_steps=n_eval_steps, sample_override=override))
        runs = jax.jit(jax.vmap(lambda x0, k: loop(params, x0, k)))(ev_j, ks)
        return metrics(runs)

    # --guided: the distill-time guide. Same math as the flagship's
    # sampling-time guide_builder (flagship_quadrotor.py), but the start
    # state comes from each sample's own conditioning context — unnormalize
    # the ctx row back to x0 and descend the rolled-out obstacle penalty.
    distill_guide = None
    if args.guided:
        from mpc_via_diffusion_model_tpu.data.normalization import unnormalize

        u_stats = ds.normalizer.stats["inputs"]
        c_stats = ds.normalizer.stats["condition"]
        per = make_penalty_grad(plant, u_stats, args.guide_scale)

        def distill_guide(u_norm_batch, ctx_norm_batch):
            x0s = unnormalize(c_stats, ctx_norm_batch)  # (B, 12)
            return jax.vmap(per)(u_norm_batch, x0s)

    report = {
        "teacher": args.teacher,
        "guided": bool(args.guided),
        "teacher_unguided": flagship_report["unguided"],
        "teacher_guided": flagship_report.get("guided"),
        "mppi_expert": flagship_report["mppi_expert"],
        "w": args.w,
        "rounds": [],
    }
    if args.guided:
        report["guide_scale"] = args.guide_scale
        report["t_start_guide"] = args.t_start_guide

    times = ddim_time_grid(25, t_start=23)
    cur_teacher = teacher_params
    optimizer = make_optimizer(lr=args.lr)
    for r in range(args.rounds):
        t0 = time.time()
        step_fn, student_times = make_distill_step(
            schedule, model.apply, optimizer, cur_teacher, times,
            w=args.w, teacher_cfg=(r == 0),
            # the guide (like the CFG weight) is baked in round 1 only:
            # later rounds distill the already-guided student
            guide_fn=distill_guide if r == 0 else None,
            t_start_guide=args.t_start_guide,
        )
        chunk_fn = make_scanned_train_steps(step_fn, args.chunk)
        chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
        state = TrainState(
            params=cur_teacher,
            ema_params=jax.tree_util.tree_map(jnp.copy, cur_teacher),
            opt_state=optimizer.init(cur_teacher),
            step=jnp.int32(0),
        )
        key = jax.random.PRNGKey(20 + r)
        losses = []
        for c in range(args.steps_per_round // args.chunk):
            key, k = jax.random.split(key)
            state, loss = chunk_jit(state, ds.inputs_normalized,
                                    ds.condition_normalized, k)
            losses.append(float(loss))
        t_train = time.time() - t0
        student = jax.device_get(state.ema_params)
        m = eval_student(student, student_times)
        rec = {
            "n_evals": len(student_times),
            "times": [int(t) for t in student_times],
            "train_seconds": round(t_train, 1),
            "final_loss": losses[-1],
            **m,
        }
        report["rounds"].append(rec)
        print(f"[round {r}] {len(student_times)}-eval student: cost "
              f"{m['cost_mean']:.1f}, CF {m['collision_free_fraction']:.3f}, "
              f"reach {m['goal_reach_fraction_0.5']:.3f} in {t_train:.0f}s",
              flush=True)
        with open(os.path.join(args.out, f"student_{len(student_times)}eval.pkl"),
                  "wb") as f:
            pickle.dump(student, f)
        cur_teacher = student
        times = student_times

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
