"""Trajectory-level distillation of the GUIDED quadrotor teacher (VERDICT r2 #3).

The per-substep guide-baking route (`distill_quadrotor.py --guided`) saturates
at collision-free ~0.81 (measured; the student sees only local guide deltas).
This script takes the distribution-level route instead:

1. SAMPLE the guided conditional distribution: batched open-loop guided CFG
   sampling (25+5 steps, obstacle cost-gradient guide at the Pareto-chosen
   operating point of artifacts/quadrotor_pareto) at the expert dataset's own
   x0 pool — the closed-loop visitation distribution the student will be
   conditioned on at eval time.
2. FINE-TUNE the teacher on those guided samples (standard diffusion loss):
   the guided distribution becomes the model's data distribution, so full
   unguided CFG sampling now reproduces guided behavior.
3. PROGRESSIVELY DISTILL the fine-tuned model 25 -> 12 -> 6 -> 3 U-Net evals
   (the plant-agnostic machinery of diffusion/distillation.py, no guide).

Scored against the GUIDED teacher's closed-loop collision-free fraction
(reference guidance path `inference_(mpd).py:254-298`; our
artifacts/flagship_quadrotor + artifacts/quadrotor_pareto operating point).
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

from quadrotor_task import (
    eval_start_states, make_loop_guide_builder, min_clearance_jax,
    make_penalty_grad, make_task_cost, track_metrics,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--out", default="artifacts/distilled_quadrotor_guided")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--w", type=float, default=0.01)
    p.add_argument("--guide-scale", type=float, default=0.1)
    p.add_argument("--t-start-guide", type=float, default=6.25,
                   help="Pareto-chosen operating point (quadrotor_pareto)")
    p.add_argument("--n-sample-chunks", type=int, default=8)
    p.add_argument("--chunk-rows", type=int, default=2048)
    p.add_argument("--no-filter", action="store_true",
                   help="keep colliding sampled plans (default: reject any "
                        "plan whose open-loop rollout clips an obstacle)")
    p.add_argument("--progress-keep", type=float, default=0.0,
                   help="if >0, additionally require the plan's final state "
                        "to close the goal distance to this fraction (or "
                        "start already near the goal) — curates for reach "
                        "as well as safety")
    p.add_argument("--guided-loop-pool", type=int, default=0,
                   help="additionally run this many guided closed loops and "
                        "add their VISITED states to the x0 pool (the "
                        "student replans from guided-visitation states, not "
                        "expert-visitation ones — DAgger-style coverage)")
    p.add_argument("--distill-guide", action="store_true",
                   help="also apply the obstacle guide to the teacher's DDIM "
                        "sub-steps during distill round 0")
    p.add_argument("--finetune-steps", type=int, default=20000)
    p.add_argument("--steps-per-round", type=int, default=30000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--finetune-lr", type=float, default=1e-3)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--eval-starts", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    # fail fast: the scanned-chunk training loops run steps//chunk chunks, so
    # steps below one chunk would silently skip training AFTER the expensive
    # guided sampling stage
    assert args.finetune_steps >= args.chunk, (
        f"--finetune-steps {args.finetune_steps} < --chunk {args.chunk}: "
        "the finetune loop would not run")
    assert args.steps_per_round >= args.chunk, (
        f"--steps-per-round {args.steps_per_round} < --chunk {args.chunk}: "
        "the distill loops would not run")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.normalization import normalize, unnormalize
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        ddim_time_grid, make_distill_step, make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_optimizer, make_scanned_train_steps, make_train_step,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, quad_cost = get_plant("quadrotor")
    cost = make_task_cost(quad_cost)  # the flagship's hover + obstacle cost
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    with open(os.path.join(args.teacher, "ema_params.pkl"), "rb") as f:
        teacher_params = pickle.load(f)
    flagship_report = json.load(open(os.path.join(args.teacher, "report.json")))

    H = args.horizon
    model = TemporalUnet(
        state_dim=4, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=12, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)

    # ---------- 1) sample the guided conditional distribution ----------
    # x0 pool = the expert dataset's own conditioning states (the closed-loop
    # visitation distribution), one guided plan per pooled state per pass.
    t0 = time.time()
    x0_pool = ds.condition
    cn_pool = ds.condition_normalized
    if args.guided_loop_pool > 0:
        # run the guided teacher CLOSED-LOOP from random starts and add every
        # visited state to the pool: at eval time the student replans from
        # guided-visitation states, which the expert dataset under-covers
        loop_guide_builder = make_loop_guide_builder(
            plant, in_stats, args.guide_scale)
        gloop = jax.jit(make_closed_loop(
            diffusion, model.apply, in_stats, c_stats, plant, cost,
            horizon=H, n_steps=60, w=args.w,
            n_diffusion_steps_without_noise=5,
            guide_builder=loop_guide_builder, n_guide_steps=1,
            t_start_guide=args.t_start_guide))
        p_rng = np.random.RandomState(31)
        st = np.zeros((args.guided_loop_pool, 12), np.float32)
        st[:, 0] = p_rng.uniform(2.2, 3.0, args.guided_loop_pool)
        st[:, 1] = p_rng.uniform(-1.2, 1.2, args.guided_loop_pool)
        st[:, 2] = p_rng.uniform(0.6, 1.4, args.guided_loop_pool)
        gks = jax.random.split(jax.random.PRNGKey(41), args.guided_loop_pool)
        gruns = jax.jit(jax.vmap(lambda x0, k: gloop(teacher_params, x0, k)))(
            jnp.asarray(st), gks)
        visited = np.asarray(gruns.x_track).reshape(-1, 12)
        visited = visited[np.isfinite(visited).all(axis=1)]
        x0_pool = jnp.concatenate([x0_pool, jnp.asarray(visited)])
        cn_pool = jnp.concatenate([
            cn_pool,
            jax.vmap(lambda x: normalize(c_stats, x))(jnp.asarray(visited))])
        print(f"[pool] +{visited.shape[0]} guided-loop visited states "
              f"({time.time() - t0:.0f}s)", flush=True)
    n_pool = x0_pool.shape[0]
    rng = np.random.RandomState(5)

    per_grad = make_penalty_grad(plant, in_stats, args.guide_scale)

    def sample_chunk(x0s, key):
        ctx = jax.vmap(lambda x: normalize(c_stats, x))(x0s)  # (B, 12)
        denoise = lambda x, t, c, m: model.apply(teacher_params, x, t, c, m)

        def guide(u_norm_b):
            return jax.vmap(per_grad)(u_norm_b, x0s)

        u_norm = diffusion.ddpm_cfg_sample(
            denoise, (x0s.shape[0], H, 4), key, ctx, w=args.w,
            n_diffusion_steps_without_noise=5, guide=guide,
            n_guide_steps=1, t_start_guide=args.t_start_guide)

        # rejection filter: (a) min obstacle clearance of each plan's
        # open-loop rollout, (b) goal progress — final state at most
        # progress-keep x the initial goal distance (or already near). The
        # training set keeps only SAFE, PROGRESSING modes of the guided
        # distribution (best-of-N data curation on both eval metrics).
        def plan_stats(u_n, x0):
            u_seq = unnormalize(in_stats, u_n)
            states = rollout(plant, x0, u_seq, unroll=len(u_seq))
            clear = min_clearance_jax(states)
            d0 = jnp.linalg.norm(x0[0:3])
            d1 = jnp.linalg.norm(states[-1, 0:3])
            return clear, d0, d1

        clear, d0, d1 = jax.vmap(plan_stats)(u_norm, x0s)
        return u_norm, clear, d0, d1

    sample_jit = jax.jit(sample_chunk)
    u_chunks, c_chunks = [], []
    n_drawn = 0
    key = jax.random.PRNGKey(17)
    for c in range(args.n_sample_chunks):
        idx = rng.randint(0, n_pool, args.chunk_rows)
        x0s = x0_pool[jnp.asarray(idx)]
        key, k = jax.random.split(key)
        u_norm, clear, d0, d1 = sample_jit(x0s, k)
        u_norm, clear = np.asarray(u_norm), np.asarray(clear)
        d0, d1 = np.asarray(d0), np.asarray(d1)
        if args.no_filter:
            keep = np.ones_like(clear, bool)
        else:
            keep = clear > 0.0
            if args.progress_keep > 0:
                keep &= (d1 <= args.progress_keep * d0) | (d0 < 0.5)
        n_drawn += len(keep)
        u_chunks.append(u_norm[keep])
        c_chunks.append(np.asarray(cn_pool[jnp.asarray(idx)])[keep])
        print(f"[sample] chunk {c + 1}/{args.n_sample_chunks}: kept "
              f"{int(keep.sum())}/{len(keep)} ({time.time() - t0:.0f}s)",
              flush=True)
    guided_u = jnp.asarray(np.concatenate(u_chunks))       # normalized
    guided_c = jnp.asarray(np.concatenate(c_chunks))       # normalized
    t_sample = time.time() - t0
    print(f"[sample] {guided_u.shape[0]}/{n_drawn} guided plans kept "
          f"in {t_sample:.0f}s", flush=True)

    # ---------- 2) fine-tune the teacher on the guided distribution ------
    t0 = time.time()
    ft_opt = make_optimizer(lr=args.finetune_lr)
    step_fn = make_train_step(diffusion, model.apply, ft_opt)
    chunk_fn = make_scanned_train_steps(step_fn, args.chunk)
    chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
    state = TrainState(
        params=teacher_params,
        ema_params=jax.tree_util.tree_map(jnp.copy, teacher_params),
        opt_state=ft_opt.init(teacher_params),
        step=jnp.int32(0),
    )
    key = jax.random.PRNGKey(23)
    loss = None
    for c in range(args.finetune_steps // args.chunk):
        key, k = jax.random.split(key)
        state, loss = chunk_jit(state, guided_u, guided_c, k)
    guided_teacher = jax.device_get(state.ema_params)
    t_ft = time.time() - t0
    print(f"[finetune] {args.finetune_steps} steps in {t_ft:.0f}s "
          f"(final loss {float(loss):.5f})", flush=True)
    # persist the expensive stage-2 product: later wide-evals / re-distills /
    # Pareto re-checks must not redo the sample+finetune pipeline
    with open(os.path.join(args.out, "guided_teacher_ema.pkl"), "wb") as f:
        pickle.dump(guided_teacher, f)
    np.savez_compressed(os.path.join(args.out, "guided_dataset.npz"),
                        inputs_normalized=np.asarray(guided_u),
                        condition_normalized=np.asarray(guided_c))

    # ---------- eval helpers (the flagship protocol) ----------
    n_eval_steps = 60
    ev_j = jnp.asarray(eval_start_states(args.eval_starts))
    ks = jax.random.split(jax.random.PRNGKey(11), args.eval_starts)

    def metrics(runs):
        return track_metrics(runs.x_track, runs.stage_costs)

    def eval_full_cfg(params):
        loop = jax.jit(make_closed_loop(
            diffusion, model.apply, in_stats, c_stats, plant, cost,
            horizon=H, n_steps=n_eval_steps, w=args.w,
            n_diffusion_steps_without_noise=5))
        runs = jax.jit(jax.vmap(lambda x0, k: loop(params, x0, k)))(ev_j, ks)
        return metrics(runs)

    def eval_student(params, times):
        sampler = make_student_ddim_sampler(schedule, model.apply, times)
        override = lambda ctx, key: sampler(params, ctx, key, (1, H, 4))
        loop = jax.jit(make_closed_loop(
            diffusion, model.apply, in_stats, c_stats, plant, cost,
            horizon=H, n_steps=n_eval_steps, sample_override=override))
        runs = jax.jit(jax.vmap(lambda x0, k: loop(params, x0, k)))(ev_j, ks)
        return metrics(runs)

    m_ft = eval_full_cfg(guided_teacher)
    print(f"[finetune] full-CFG UNGUIDED closed loop: CF "
          f"{m_ft['collision_free_fraction']:.3f}, reach "
          f"{m_ft['goal_reach_fraction_0.5']:.3f}", flush=True)

    report = {
        "method": "guided data distillation (sample -> finetune -> distill)",
        "teacher": args.teacher,
        "teacher_unguided": flagship_report["unguided"],
        "teacher_guided": flagship_report.get("guided"),
        "mppi_expert": flagship_report["mppi_expert"],
        "w": args.w,
        "guide_scale": args.guide_scale,
        "t_start_guide": args.t_start_guide,
        "n_guided_samples": int(guided_u.shape[0]),
        "n_drawn": int(n_drawn),
        "collision_filter": not args.no_filter,
        "sample_seconds": round(t_sample, 1),
        "finetune_seconds": round(t_ft, 1),
        "finetuned_full_cfg": m_ft,
        "rounds": [],
    }

    # ---------- 3) progressive distillation ----------
    # --distill-guide: belt-and-braces — the data already IS the guided
    # distribution, but the guide delta on the teacher's sub-steps (round 0)
    # re-anchors any student drift back toward the safe modes
    distill_guide = None
    if args.distill_guide:
        def distill_guide(u_norm_batch, ctx_norm_batch):
            x0s = jax.vmap(lambda c: unnormalize(c_stats, c))(ctx_norm_batch)
            return jax.vmap(per_grad)(u_norm_batch, x0s)

    times = ddim_time_grid(25, t_start=23)
    cur_teacher = guided_teacher
    optimizer = make_optimizer(lr=args.lr)
    for r in range(args.rounds):
        t0 = time.time()
        step_fn, student_times = make_distill_step(
            schedule, model.apply, optimizer, cur_teacher, times,
            w=args.w, teacher_cfg=(r == 0),
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
            state, loss = chunk_jit(state, guided_u, guided_c, k)
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
