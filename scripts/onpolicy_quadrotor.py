"""Best-of-K SELF-distillation of the quadrotor 1-eval student at
on-policy states.

The deep 1-eval student (artifacts/distilled_quadrotor_deep) measures CF
0.89 raw but CF 1.0 / safe-reach 0.81 when 16 candidates are drawn per
replan and scored safety-first (bench.json, XLA K=16 at 5.8 kHz). That
selection costs a 16x-batched U-Net pass + 16 candidate rollouts per
replan. This script BAKES THE SELECTION IN, the DAgger-style analogue of
scripts/onpolicy_panda.py with the selected policy as its own expert:

1. Roll the DEPLOYED config (K=16 safety-first, the proven CF-1.0 policy)
   from the 64-start wide-eval grid, collect visited states.
2. At each visited state draw 16 candidate plans from the SAME student and
   keep the argmin of (rolled-out task cost + hard collision penalty) —
   the amortization pipeline's curation score (scripts/amortize_quadrotor.py,
   the recipe behind the repo-best 0.859 safe-reach MLP).
3. Fine-tune the student at its single DDIM grid time with the recon
   plan-matching loss, mixed 50/50 with the deep-distillation dataset.
4. Eval K=1 (raw) and K=16 on the 64-start wide protocol, before/after.

Outcome target: single-draw (K=1) quality approaching the K=16 operating
point — CF ~1.0 at the 15-18 kHz single-row kernel rate instead of 5.8 kHz.

Writes artifacts/onpolicy_quadrotor/{student_1eval.pkl, report.json}.
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
    p.add_argument("--student-dir", default="artifacts/distilled_quadrotor_deep")
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--out", default="artifacts/onpolicy_quadrotor")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--collect-starts", type=int, default=64)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--collect-steps", type=int, default=None,
                   help="collection-episode length (default --steps); longer "
                        "episodes visit near-goal / post-arrival drift states "
                        "so station-keeping labels exist (the round-5 fix for "
                        "the goal-reach drift measured in "
                        "onpolicy_scene_scaled/episode_length_diag.json)")
    p.add_argument("--lqr-candidate", action="store_true",
                   help="append the analytic LQR hover-regulator plan "
                        "(quadrotor_task.make_lqr_hover_plan) to every "
                        "best-of-K label set")
    p.add_argument("--eval-steps-long", type=int, default=0,
                   help="if >0, add eval rows at this episode length too "
                        "(station-keeping diagnostic)")
    p.add_argument("--init-student", default=None,
                   help="start from this pkl instead of "
                        "<student-dir>/student_1eval.pkl (chain a run on top "
                        "of a committed one; 'before' rows eval THIS init)")
    p.add_argument("--iter-offset", type=int, default=0,
                   help="offset per-iteration seeds so a chained run "
                        "collects fresh starts/keys")
    p.add_argument("--label-k", type=int, default=16)
    p.add_argument("--train-steps", type=int, default=4000,
                   help="fine-tune steps per iteration")
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--onpolicy-frac", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-starts", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

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
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout_with_cost
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import (
        TrainState, make_custom_train_step, make_optimizer,
        make_scanned_train_steps,
    )
    from quadrotor_task import (
        eval_start_states, make_lqr_hover_plan, make_select_cost,
        min_clearance_jax, track_metrics,
    )

    os.makedirs(args.out, exist_ok=True)
    plant, cost = get_plant("quadrotor")
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    deep = np.load(os.path.join(args.student_dir, "deep_dataset.npz"))
    mix_inputs = jnp.asarray(deep["inputs_normalized"])
    mix_conds = jnp.asarray(deep["condition_normalized"])

    sreport = json.load(open(os.path.join(args.student_dir, "report.json")))
    times = [r for r in sreport["rounds"] if r["n_evals"] == 1][0]["times"]
    init_path = (args.init_student if args.init_student
                 else os.path.join(args.student_dir, "student_1eval.pkl"))
    with open(init_path, "rb") as f:
        student0 = pickle.load(f)

    H = args.horizon
    model = TemporalUnet(
        state_dim=4, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=12,
        conditioning_type="default", cfg_indicator=True)
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)
    sampler = make_student_ddim_sampler(schedule, model.apply, times)
    sel_cost = make_select_cost(cost)

    starts = jnp.asarray(eval_start_states(args.eval_starts, seed=7))
    eval_ks = jax.random.split(jax.random.PRNGKey(11), args.eval_starts)

    _loop_cache = {}

    def make_loop(params, K, steps=None):
        # cache per (weights identity, K, steps): collection and eval share
        # the same jitted program for the same student (compiles are minutes)
        steps = args.steps if steps is None else steps
        ck = (id(params), K, steps)
        if ck not in _loop_cache:
            override = lambda ctx, key: sampler(params, ctx, key, (K, H, 4))
            _loop_cache[ck] = jax.jit(make_closed_loop(
                diffusion, model.apply, in_stats, c_stats, plant,
                sel_cost if K > 1 else cost,
                horizon=H, n_steps=steps, n_candidates=K,
                sample_override=override))
        return _loop_cache[ck]

    def eval_student(params, K, steps=None):
        loop = make_loop(params, K, steps)
        runs = jax.jit(jax.vmap(lambda x0, k: loop(params, x0, k)))(
            starts, eval_ks)
        return track_metrics(np.asarray(runs.x_track))

    lqr_plan = (make_lqr_hover_plan(plant, cost, in_stats, H)
                if args.lqr_candidate else None)

    # best-of-K label at a state: candidates from the CURRENT student,
    # scored by rolled-out task cost + hard collision penalty (the
    # amortize_quadrotor curation score)
    def make_labeler(params):
        @jax.jit
        def label(x0s, keys):
            def per_row(x0, key):
                ctx = normalize(c_stats, x0)[None]
                plans = sampler(params, ctx, key, (args.label_k, H, 4))
                if lqr_plan is not None:
                    plans = jnp.concatenate([plans, lqr_plan(x0)[None]])

                def score(u_n):
                    u = unnormalize(in_stats, u_n)
                    xs, c = rollout_with_cost(plant, cost, x0, u)
                    clear = min_clearance_jax(xs)
                    s = c + 1e5 * jnp.maximum(-clear, 0.0)
                    # NaN (overflowed rollout) would WIN jnp.argmin — make
                    # it lose (see onpolicy_scene.py)
                    return jnp.where(jnp.isfinite(s), s, jnp.inf)

                return plans[jnp.argmin(jax.vmap(score)(plans))]

            return jax.vmap(per_row)(x0s, keys)

        return label

    # fine-tune loss at the student's grid time (onpolicy_panda.py recipe)
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
        return jnp.mean(jnp.square(recon - x0b))

    optimizer = make_optimizer(lr=args.lr)
    train_step = make_custom_train_step(
        loss_fn, optimizer, step_start_ema=0, update_ema_every=1)
    chunk_fn = make_scanned_train_steps(train_step, args.chunk)
    chunk_jit = jax.jit(lambda st, a, b, k: chunk_fn(st, a, b, k, args.batch_size))
    _rng = lambda v: f"{v[0]:.4f}->{v[-1]:.4f}" if v else "n/a"

    report = {
        "protocol": f"{args.eval_starts}-start wide eval (seed 7), "
                    f"{args.steps} steps, PRNGKey(11)",
        "times": times, "label_k": args.label_k,
        "collect_steps": args.collect_steps or args.steps,
        "lqr_candidate": bool(args.lqr_candidate),
        "init_student": init_path, "iter_offset": args.iter_offset,
        "train": {"steps_per_iteration": args.train_steps,
                  "total_steps": args.train_steps * args.iterations,
                  "lr": args.lr, "onpolicy_frac": args.onpolicy_frac},
        "rows": [],
    }
    # baseline rows come from the committed wide_eval.json / bench.json
    report["before"] = {"source": f"{args.student_dir}/bench.json",
                        "note": "xla / xla_k16 rows, 16-start bench protocol"}

    cur = student0
    pool_u, pool_c = [], []
    for it in range(args.iterations):
        t0 = time.time()
        gi = it + args.iter_offset
        loop_k = make_loop(cur, args.label_k, args.collect_steps)
        cks = jax.random.split(jax.random.PRNGKey(100 + gi),
                               args.collect_starts)
        runs = jax.jit(jax.vmap(lambda x0, k: loop_k(cur, x0, k)))(
            jnp.asarray(eval_start_states(args.collect_starts, seed=20 + gi)),
            cks)
        visited = np.asarray(runs.x_track[:, :-1]).reshape(-1, 12)
        # long collection episodes can diverge (see onpolicy_scene.py): a
        # non-finite visited state poisons its label and NaN-guard-skips
        # every on-policy train chunk — drop diverged states
        ok = np.isfinite(visited).all(-1) & (np.abs(visited) < 100.0).all(-1)
        visited = visited[ok]
        print(f"[it {it}] collect: {len(visited)} states "
              f"({(~ok).sum()} diverged dropped, "
              f"{time.time() - t0:.0f}s)", flush=True)

        t1 = time.time()
        labeler = make_labeler(cur)
        base_key = jax.random.PRNGKey(200 + gi)
        CH = 512
        xs = jnp.asarray(visited)
        lab = []
        for i in range(0, len(visited), CH):
            keys = jax.vmap(lambda j: jax.random.fold_in(base_key, j))(
                jnp.arange(i, min(i + CH, len(visited))))
            lab.append(np.asarray(labeler(xs[i:i + CH], keys)))
        labels = np.concatenate(lab)  # (N, H, 4) normalized plans
        print(f"[it {it}] label: best-of-{args.label_k} at {len(labels)} "
              f"states ({time.time() - t1:.0f}s)", flush=True)

        lab_ok = np.isfinite(labels).all(axis=(1, 2))
        pool_u.append(labels[lab_ok])
        pool_c.append(np.asarray(jax.vmap(
            lambda x: normalize(c_stats, x))(xs))[lab_ok])
        onp_u = jnp.asarray(np.concatenate(pool_u))
        onp_c = jnp.asarray(np.concatenate(pool_c))

        state = TrainState(
            params=cur, ema_params=jax.tree_util.tree_map(jnp.copy, cur),
            opt_state=optimizer.init(cur), step=jnp.int32(0))
        key = jax.random.PRNGKey(77 + gi)
        n_chunks = args.train_steps // args.chunk
        n_onp = int(round(args.onpolicy_frac * n_chunks))
        slots = (set(np.round(np.linspace(0, n_chunks - 1, n_onp)).astype(int))
                 if n_onp else set())
        t2 = time.time()
        ls = {"onp": [], "ds": []}
        for c in range(n_chunks):
            key, k = jax.random.split(key)
            if c in slots:
                state, loss = chunk_jit(state, onp_u, onp_c, k)
                ls["onp"].append(float(loss))
            else:
                state, loss = chunk_jit(state, mix_inputs, mix_conds, k)
                ls["ds"].append(float(loss))
        cur = jax.device_get(state.ema_params)
        print(f"[it {it}] train {args.train_steps} steps "
              f"({time.time() - t2:.0f}s): onp {_rng(ls['onp'])}, "
              f"ds {_rng(ls['ds'])}", flush=True)

    student = cur
    with open(os.path.join(args.out, "student_1eval.pkl"), "wb") as f:
        pickle.dump(student, f)

    eval_lengths = [args.steps]
    if args.eval_steps_long:
        eval_lengths.append(args.eval_steps_long)
    for tag, params in (("before", student0), ("onpolicy", student)):
        for steps in eval_lengths:
            for K in (1, 16):
                m = eval_student(params, K, steps)
                row = {"student": tag, "K": K, "steps": steps, **m}
                report["rows"].append(row)
                print(json.dumps(row), flush=True)
                with open(os.path.join(args.out, "report.json"), "w") as f:
                    json.dump(report, f, indent=2)

    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
