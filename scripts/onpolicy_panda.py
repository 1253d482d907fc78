"""On-policy (DAgger-style) fine-tune of the 1-eval panda student.

The horizon diagnostic (flagship_panda_rbd/horizon_diagnosis.json) showed
closed-loop VISITED states sit outside the teacher dataset (normalized
condition NN distance 1.51 vs the dataset's self-NN 0.45) — the classic
behavior-cloning covariate shift the reference's NN baseline also hits
(`/root/reference/scripts/inference/NN_MPC_Inference.py` role). Best-of-K
with truncated selection saturates at 1.052x expert for the 1-eval student
(artifacts/panda_candidates): selection cannot fix sample quality at states
the model never saw.

The fix, diffusion-native DAgger:
1. Roll the 1-eval student closed-loop from jittered starts, collect the
   visited states (the student's OWN state distribution).
2. Solve iLQR at every visited state (vmapped on-device) -> expert plans.
3. Fine-tune the student with the plain eps/recon loss AT ITS OWN DDIM GRID
   TIME on a 50/50 mix of (dataset plans, dataset conditions) and (expert
   plans, visited conditions). A 1-eval student only ever denoises from its
   single grid time t*, so the recon target at t* IS its output plan: this
   trains "at the states you actually visit, output the expert's plan"
   without touching the teacher or the rest of the ladder.
4. Eval on the standard 10-seed protocol: K=1, K=4 sel_h=16, K=16 sel_h=32.

Writes artifacts/onpolicy_panda/{student_1eval.pkl, report.json}.
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
    p.add_argument("--student-dir", default="artifacts/distilled_panda_deep")
    p.add_argument("--out", default="artifacts/onpolicy_panda")
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--collect-starts", type=int, default=16,
                   help="jittered starts around the eval x0 for the "
                        "on-policy state collection")
    p.add_argument("--jitter", type=float, default=0.1,
                   help="uniform joint-angle jitter (rad) on the 0.3-rad "
                        "start for collection diversity")
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--ilqr-iters", type=int, default=25)
    p.add_argument("--train-steps", type=int, default=4000,
                   help="fine-tune steps PER DAgger iteration")
    p.add_argument("--iterations", type=int, default=2,
                   help="DAgger iterations (collect under the current "
                        "student each time; expert pool aggregated)")
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--onpolicy-frac", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-seeds", type=int, default=10)
    p.add_argument("--init-student", default=None,
                   help="start from this pkl instead of the distilled "
                        "ladder's 1-eval student — chains more DAgger "
                        "iterations on top of a committed run (VERDICT r4 "
                        "#3)")
    p.add_argument("--iter-offset", type=int, default=0,
                   help="offset for per-iteration seeds so a chained run "
                        "collects fresh starts/keys (set to the prior "
                        "run's --iterations)")
    p.add_argument("--collect-K", type=int, default=1,
                   help="collect visited states under best-of-K with "
                        "--collect-sel-h truncated selection (the "
                        "DEPLOYMENT policy) instead of the raw K=1 student "
                        "— aligns the labeled distribution with the states "
                        "the deployed selector actually visits")
    p.add_argument("--collect-sel-h", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.normalization import normalize
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, make_panda_context
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig
    from mpc_via_diffusion_model_tpu.solvers.ilqr import ilqr_solve_batched
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_custom_train_step, make_optimizer,
        make_scanned_train_steps,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, cost = get_plant("panda")
    to_cond = make_panda_context()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    flagship_report = json.load(open(os.path.join(args.teacher, "report.json")))
    expert_cost = flagship_report["closed_loop_cost_nmpc"]
    teacher_cost = flagship_report["closed_loop_cost_diffusion_mean10"]

    sreport = json.load(open(os.path.join(args.student_dir, "report.json")))
    times = [r for r in sreport["rounds"] if r["n_evals"] == 1][0]["times"]
    init_path = (args.init_student if args.init_student else
                 os.path.join(args.student_dir, "student_1eval.pkl"))
    with open(init_path, "rb") as f:
        student0 = pickle.load(f)

    H = args.horizon
    model = TemporalUnet(
        state_dim=7, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=20,
        conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)
    sampler = make_student_ddim_sampler(schedule, model.apply, times)

    x0_eval = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])
    eval_keys = jax.random.split(jax.random.PRNGKey(7), args.eval_seeds)

    def make_loop(params, K, sel_h=None):
        # sample_override(ctx, key) closes over CONCRETE weights (the
        # runtime's contract) — one jitted program per (student, K) config
        override = lambda ctx, key: sampler(params, ctx, key, (K, H, 7))
        return jax.jit(make_closed_loop(
            diffusion, model.apply, in_stats, c_stats, plant, cost,
            horizon=H, n_steps=args.steps, n_candidates=K,
            sample_override=override, state_to_condition=to_cond,
            selection_horizon=sel_h))

    def eval_student(params, K=1, sel_h=None):
        loop = make_loop(params, K, sel_h)
        runs = jax.jit(jax.vmap(lambda k: loop(params, x0_eval, k)))(eval_keys)
        costs = np.asarray(runs.stage_costs.sum(axis=1))
        return float(costs.mean()), float(costs.std())

    # ---- fine-tune loss at the student's grid time ----
    t_star = int(times[0])
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sra = float(np.sqrt(1.0 / abar[t_star]))
    srm = float(np.sqrt(1.0 / abar[t_star] - 1.0))
    sqrt_ab = float(np.sqrt(abar[t_star]))
    sqrt_1mab = float(np.sqrt(1.0 - abar[t_star]))

    def loss_fn(params, x0b, ctxb, key):
        b = x0b.shape[0]
        noise = jax.random.normal(key, x0b.shape, x0b.dtype)
        x_t = sqrt_ab * x0b + sqrt_1mab * noise
        t = jnp.full((b,), t_star, jnp.int32)
        eps = model.apply(params, x_t, t, ctxb, jnp.zeros((b, 1), x0b.dtype))
        recon = sra * x_t - srm * eps
        # recon-space MSE at the student's own sampling time: its one DDIM
        # step outputs clip(recon), so this is a direct plan-matching loss
        return jnp.mean(jnp.square(recon - x0b))

    optimizer = make_optimizer(lr=args.lr)
    # the shared NaN-guard/EMA step with the custom grid-time loss; EMA
    # decays from step 0 and updates every step (fine-tune of an
    # already-good EMA checkpoint, not cold training)
    train_step = make_custom_train_step(
        loss_fn, optimizer, step_start_ema=0, update_ema_every=1)

    # ---- DAgger iterations: collect -> iLQR-label -> fine-tune, with the
    # on-policy pool AGGREGATED across iterations (Ross et al. 2011 —
    # non-aggregated online updates forget iteration-1 states) ----
    chunk_fn = make_scanned_train_steps(train_step, args.chunk)
    chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
    cfg = ILQRConfig(horizon=H, n_iterations=args.ilqr_iters)
    solve = jax.jit(
        lambda xb, ub: ilqr_solve_batched(plant, cost, xb, ub, cfg).us)
    _rng = lambda v: f"{v[0]:.4f}->{v[-1]:.4f}" if v else "n/a"

    cur = student0
    pool_inputs, pool_conds = [], []
    losses = {"onp": [], "ds": []}
    n_visited = 0
    for it in range(args.iterations):
        # 1. collect on-policy states under the CURRENT student
        t0 = time.time()
        gi = it + args.iter_offset  # global iteration index (chained runs)
        key_x0 = jax.random.PRNGKey(123 + gi)
        jit_x0 = x0_eval[None] + jnp.concatenate([
            jax.random.uniform(key_x0, (args.collect_starts, 7),
                               minval=-args.jitter, maxval=args.jitter),
            jnp.zeros((args.collect_starts, 7))], axis=-1)
        loop_k1 = (make_loop(cur, args.collect_K, args.collect_sel_h)
                   if args.collect_K > 1 else make_loop(cur, 1))
        ks = jax.random.split(jax.random.PRNGKey(11 + gi), args.collect_starts)
        runs = jax.jit(jax.vmap(lambda x0v, k: loop_k1(cur, x0v, k)))(
            jit_x0, ks)
        visited = np.asarray(runs.x_track[:, :-1]).reshape(-1, 14)
        n_visited += len(visited)
        print(f"[it {it}] collect: {len(visited)} states "
              f"({time.time() - t0:.0f}s)", flush=True)

        # 2. expert iLQR solves, chunked (one giant H=128 dispatch risks
        # the >10 min TPU-worker crash, CLAUDE.md quirk 6)
        t1 = time.time()
        xs = jnp.asarray(visited)
        CH = 256
        u0s = jnp.zeros((CH, H, plant.control_dim))
        sols = [np.asarray(solve(xs[i:i + CH], u0s[:len(xs[i:i + CH])]))
                for i in range(0, len(visited), CH)]
        expert_plans = np.concatenate(sols)
        print(f"[it {it}] ilqr: {len(expert_plans)} solves "
              f"({time.time() - t1:.0f}s)", flush=True)

        pool_inputs.append(np.asarray(
            normalize(in_stats, jnp.asarray(expert_plans))))
        pool_conds.append(np.asarray(normalize(
            c_stats, jax.vmap(to_cond)(jnp.asarray(visited)))))
        # the growing pool shape costs one chunk_jit recompile per
        # iteration (~1 min) — acceptable at iterations<=3; preallocate +
        # mask if this ever scales up
        onp_inputs_j = jnp.asarray(np.concatenate(pool_inputs))
        onp_conds_j = jnp.asarray(np.concatenate(pool_conds))

        # 3. fine-tune from the current student on the 50/50 mixed stream:
        # each chunk draws from one source (same-shape batches keep the
        # scanned-step machinery unchanged)
        state = TrainState(
            params=cur,
            ema_params=jax.tree_util.tree_map(jnp.copy, cur),
            opt_state=optimizer.init(cur), step=jnp.int32(0))
        key = jax.random.PRNGKey(77 + gi)
        n_chunks = args.train_steps // args.chunk
        n_onp = int(round(args.onpolicy_frac * n_chunks))
        onp_slots = (set(np.round(
            np.linspace(0, n_chunks - 1, n_onp)).astype(int))
            if n_onp else set())
        t2 = time.time()
        it_losses = {"onp": [], "ds": []}
        for c in range(n_chunks):
            key, k = jax.random.split(key)
            if c in onp_slots:
                state, loss = chunk_jit(state, onp_inputs_j, onp_conds_j, k)
                it_losses["onp"].append(float(loss))
            else:
                state, loss = chunk_jit(state, ds.inputs_normalized,
                                        ds.condition_normalized, k)
                it_losses["ds"].append(float(loss))
        cur = jax.device_get(state.ema_params)
        losses["onp"] += it_losses["onp"]
        losses["ds"] += it_losses["ds"]
        print(f"[it {it}] train {args.train_steps} steps "
              f"({time.time() - t2:.0f}s): onp {_rng(it_losses['onp'])}, "
              f"ds {_rng(it_losses['ds'])}", flush=True)
    student = cur
    # persist the trained weights BEFORE the eval loop: each eval below is
    # a fresh multi-minute jit compile, and a relay drop there (CLAUDE.md
    # quirk 6) must not discard the multi-minute DAgger run
    with open(os.path.join(args.out, "student_1eval.pkl"), "wb") as f:
        pickle.dump(student, f)

    # ---- 4. eval: K=1 and the selection operating points ----
    report = {
        "expert_closed_loop_cost": expert_cost,
        "init_student": init_path,
        "iter_offset": args.iter_offset,
        "collect_K": args.collect_K,
        "collect_sel_h": args.collect_sel_h if args.collect_K > 1 else None,
        "teacher_closed_loop_cost_mean10": teacher_cost,
        "times": times,
        "protocol": "x0=0.3rad, 80 steps, 10 seeds PRNGKey(7)",
        "collect": {"starts": args.collect_starts, "jitter": args.jitter,
                    "iterations": args.iterations,
                    "n_states": int(n_visited),
                    "ilqr_iters": args.ilqr_iters},
        "train": {"steps_per_iteration": args.train_steps,
                  "total_steps": args.train_steps * args.iterations,
                  "lr": args.lr,
                  "onpolicy_frac": args.onpolicy_frac,
                  "final_loss_onp": losses["onp"][-1] if losses["onp"] else None,
                  "final_loss_ds": losses["ds"][-1] if losses["ds"] else None},
        "rows": [],
    }
    # "before" rows are the committed artifacts/panda_candidates numbers
    # (same protocol, same checkpoints) — read, not re-measured
    before = {"source": "artifacts/panda_candidates/report.json"}
    try:
        prior = json.load(open(before["source"]))
        for r in prior["rows"]:
            if r["artifact"].endswith("distilled_panda_deep") and r["n_evals"] == 1:
                if r["K"] == 1:
                    before["k1_ratio_vs_expert"] = r["ratio_vs_expert"]
                if r["K"] == 4 and r["selection_horizon"] == 16:
                    before["k4_selh16_ratio_vs_expert"] = r["ratio_vs_expert"]
    except (OSError, KeyError):
        pass
    report["before"] = before
    for K, sel_h in ((1, None), (4, 16), (16, 32)):
        m, s = eval_student(student, K, sel_h)
        row = {"student": "onpolicy", "K": K,
               "selection_horizon": sel_h or H,
               "cost_mean": m, "cost_std": s,
               "ratio_vs_expert": round(m / expert_cost, 4),
               "ratio_vs_teacher": round(m / teacher_cost, 4)}
        report["rows"].append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(args.out, "report.json"), "w") as f:
            json.dump(report, f, indent=2)

    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
