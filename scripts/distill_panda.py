"""Progressive distillation of the panda_rbd CFG policy (third plant family).

Same recipe as scripts/distill_flagship.py / distill_quadrotor.py — the
machinery in diffusion/distillation.py is plant-agnostic. The 25-step CFG
teacher trained on true 7-link RNE dynamics (artifacts/flagship_panda_rbd,
reference Panda closed loop `inference_diffusion_panda.py:28-505`) distills
to conditional-only DDIM students with 12 -> 6 -> 3 U-Net evals, CFG weight
baked in.

Eval per round: closed-loop cost on the flagship protocol (x0 = 0.3 rad on
all joints, 80 steps, mean over 10 sampling seeds) against the stored
expert/teacher costs. The final student also gets a fused whole-episode
kernel throughput row (the H=128/7ch config exercises the kernel's
state_to_condition FK path and its VMEM budget — VERDICT r2 #2/#6).
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
    p.add_argument("--out", default="artifacts/distilled_panda")
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--w", type=float, default=0.01)
    p.add_argument("--steps-per-round", type=int, default=20000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--eval-seeds", type=int, default=10)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--init-student", default=None,
                   help="resume from a saved student .pkl (skips re-running "
                        "earlier rounds); requires --init-times")
    p.add_argument("--init-times", default=None,
                   help="comma-separated DDIM grid of --init-student, e.g. "
                        "'23,15,7' for the 3-eval student")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if (args.init_student is None) != (args.init_times is None):
        p.error("--init-student and --init-times must be given together")

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
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, make_panda_context
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, load_checkpoint, make_optimizer, make_scanned_train_steps,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, cost = get_plant("panda")
    to_cond = make_panda_context()

    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    tstate, _ = load_checkpoint(os.path.join(args.teacher, "checkpoints", "final.ckpt"))
    teacher_params = jax.device_get(tstate.ema_params)
    flagship_report = json.load(open(os.path.join(args.teacher, "report.json")))

    model = TemporalUnet(
        state_dim=7, n_support_points=args.horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=20, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    x0 = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])
    eval_keys = jax.random.split(jax.random.PRNGKey(7), args.eval_seeds)

    def eval_student(params, times):
        sampler = make_student_ddim_sampler(schedule, model.apply, times)
        override = lambda ctx, key: sampler(params, ctx, key, (1, args.horizon, 7))
        loop = jax.jit(make_closed_loop(
            diffusion, model.apply, ds.normalizer.stats["inputs"],
            ds.normalizer.stats["condition"], plant, cost,
            horizon=args.horizon, n_steps=args.steps,
            sample_override=override, state_to_condition=to_cond))
        runs = jax.jit(jax.vmap(lambda k: loop(params, x0, k)))(eval_keys)
        costs = np.asarray(runs.stage_costs.sum(axis=1))
        return {"closed_loop_cost_mean": float(costs.mean()),
                "closed_loop_cost_std": float(costs.std()),
                "all_finite": bool(np.isfinite(np.asarray(runs.x_track)).all())}

    expert_cost = flagship_report["closed_loop_cost_nmpc"]
    teacher_cost = flagship_report["closed_loop_cost_diffusion_mean10"]
    report = {
        "teacher": args.teacher,
        "expert_closed_loop_cost": expert_cost,
        "teacher_closed_loop_cost_mean10": teacher_cost,
        "w": args.w,
        "rounds": [],
    }

    times = ddim_time_grid(25, t_start=23)
    cur_teacher = teacher_params
    if args.init_student is not None:
        # resume a deeper distillation: the saved student becomes the next
        # round's (conditional-only) teacher on its own grid — same resume
        # semantics as scripts/distill_flagship.py
        with open(args.init_student, "rb") as f:
            cur_teacher = pickle.load(f)
        times = [int(t) for t in args.init_times.split(",")]
        if any(t < 0 or t >= schedule.n_steps for t in times):
            raise SystemExit(f"--init-times entries must be in "
                             f"[0, {schedule.n_steps}): got {times}")
        if times != sorted(times, reverse=True):
            raise SystemExit(f"--init-times must be strictly decreasing "
                             f"(DDIM grid, high t first): got {times}")
        report["init_student"] = args.init_student
        print(f"[init] resuming from {args.init_student} on grid {times}",
              flush=True)
    optimizer = make_optimizer(lr=args.lr)
    for r in range(args.rounds):
        t0 = time.time()
        step_fn, student_times = make_distill_step(
            schedule, model.apply, optimizer, cur_teacher, times,
            w=args.w,
            teacher_cfg=(r == 0 and args.init_student is None),
        )
        chunk_fn = make_scanned_train_steps(step_fn, args.chunk)
        chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
        state = TrainState(
            params=cur_teacher,
            ema_params=jax.tree_util.tree_map(jnp.copy, cur_teacher),
            opt_state=optimizer.init(cur_teacher),
            step=jnp.int32(0),
        )
        key = jax.random.PRNGKey(40 + r)
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
            "cost_ratio_vs_expert": round(m["closed_loop_cost_mean"] / expert_cost, 4),
            "cost_ratio_vs_teacher": round(m["closed_loop_cost_mean"] / teacher_cost, 4),
            **m,
        }
        report["rounds"].append(rec)
        print(f"[round {r}] {len(student_times)}-eval student: cost "
              f"{m['closed_loop_cost_mean']:.1f} ({rec['cost_ratio_vs_expert']}x "
              f"expert) in {t_train:.0f}s", flush=True)
        with open(os.path.join(args.out, f"student_{len(student_times)}eval.pkl"),
                  "wb") as f:
            pickle.dump(student, f)
        cur_teacher = student
        times = student_times

    # fused-chain throughput of the final student: the few-eval DDIM chain
    # as one Pallas kernel per replan (256 student rows in VMEM), RNE plant
    # stepped XLA-side — the whole-episode kernel is out of envelope here
    # because the articulated plant step does not lower to Mosaic
    # (bench_highdim.py::_panda_fused has the measured story).
    from mpc_via_diffusion_model_tpu.ops.fused_denoise import make_fused_ddim_chain

    for wd, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        try:
            chain = make_fused_ddim_chain(model, cur_teacher, schedule, times,
                                          n_samples=1, weights_dtype=wd)
            loop = jax.jit(make_closed_loop(
                diffusion, model.apply, ds.normalizer.stats["inputs"],
                ds.normalizer.stats["condition"], plant, cost,
                horizon=args.horizon, n_steps=args.steps,
                sample_override=chain, state_to_condition=to_cond))
            from mpc_via_diffusion_model_tpu.eval.timing import pipelined_time_fn
            key = jax.random.PRNGKey(3)
            run = lambda kk: loop(cur_teacher, x0, kk)
            dt = pipelined_time_fn(
                lambda kk: run(kk).x_track,
                [(jax.random.fold_in(key, i),) for i in range(8)])
            ep_costs = run(key).stage_costs
            report[f"fused_chain_hz_{tag}"] = round(args.steps / dt, 1)
            report[f"fused_chain_cost_ratio_{tag}"] = round(
                float(jnp.sum(ep_costs)) / expert_cost, 4)
            print(f"[fused chain {tag}] {report[f'fused_chain_hz_{tag}']} Hz, cost "
                  f"{report[f'fused_chain_cost_ratio_{tag}']}x expert", flush=True)
        except Exception as e:  # noqa: BLE001
            report[f"fused_chain_hz_{tag}"] = None
            report[f"fused_chain_error_{tag}"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"[fused chain {tag}] failed: {report[f'fused_chain_error_{tag}']}",
                  flush=True)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
