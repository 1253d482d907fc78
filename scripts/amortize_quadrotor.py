"""Amortize the GUIDED quadrotor student into a 0-eval MLP policy.

Same recipe as scripts/amortize_flagship.py, applied to the safety-critical
workload: sample the guided-data 3-eval student (artifacts/
distilled_quadrotor_guided — collision-free 0.94 at 64 starts) at ONE
shared DDIM init so it becomes a mode-consistent deterministic map
state -> u-horizon, regress an MLP onto the pairs, and evaluate
collision-free / reach / cost on the held-out 64-start protocol
(quadrotor_task.eval_start_states(seed=97), the same states
eval_quadrotor_policies.py uses) against the MPPI expert and the student.

A DIRECT-regression control arm (same net, same budget, trained on the
expert dataset) quantifies what the generative mode-selection buys on a
task where averaging modes can mean flying INTO an obstacle.

Usage: python scripts/amortize_quadrotor.py   (artifacts/amortized_quadrotor)
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import json
import os
import pickle
import time

import numpy as np

from quadrotor_task import eval_start_states, make_task_cost, track_metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="artifacts/flagship_quadrotor")
    p.add_argument("--student-dir", default="artifacts/distilled_quadrotor_guided")
    p.add_argument("--evals", type=int, default=3)
    p.add_argument("--out", default="artifacts/amortized_quadrotor")
    p.add_argument("--horizon", type=int, default=48)
    p.add_argument("--n-pairs", type=int, default=65536)
    p.add_argument("--gen-batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ema-decay", type=float, default=0.995)
    p.add_argument("--noise-seed", type=int, default=100)
    p.add_argument("--best-of", type=int, default=8,
                   help="candidate plans per state; the per-state key is "
                        "folded from the POOL INDEX, so the same state "
                        "always yields the same candidates and the argmin "
                        "selector stays a deterministic function of the "
                        "state (mode consistency)")
    p.add_argument("--eval-starts", type=int, default=64)
    p.add_argument("--eval-steps", type=int, default=60)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import make_ampc_closed_loop
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.models import AMPCNet, TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import fit_mlp_regression

    os.makedirs(args.out, exist_ok=True)
    plant, quad_cost = get_plant("quadrotor")
    cost = make_task_cost(quad_cost)
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]

    src = json.load(open(os.path.join(args.student_dir, "report.json")))
    rec = next(r for r in src["rounds"] if r["n_evals"] == args.evals)
    times = rec["times"]
    with open(os.path.join(args.student_dir,
                           f"student_{args.evals}eval.pkl"), "rb") as f:
        student = pickle.load(f)

    H = args.horizon
    unet = TemporalUnet(
        state_dim=4, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=12, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    sampler = make_student_ddim_sampler(schedule, unet.apply, times)

    # ---------- 1) mode-consistent pairs: best-of-K per state ----------
    # A single shared DDIM init (the flagship recipe) measured CF 1.0 but
    # reach 0.0 here — the one draw picks a conservative non-progressing
    # mode everywhere. Instead: K candidate plans per state (keys folded
    # from the POOL INDEX -> same state, same candidates, deterministic),
    # scored by the rolled-out task cost with a hard collision penalty, and
    # the ARGMIN plan becomes the regression target — amortizing the
    # best-of-K curated student, the same curation idea as the guided-data
    # distillation stage (scripts/distill_quadrotor_guided_data.py).
    from mpc_via_diffusion_model_tpu.data.normalization import unnormalize
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout_with_cost
    from quadrotor_task import min_clearance_jax
    t0 = time.time()
    n_pool = ds.condition_normalized.shape[0]
    base_key = jax.random.PRNGKey(args.noise_seed)

    @jax.jit
    def gen_chunk(x0s, ctx_norm, keys):
        def per_row(x0, ctx, key):
            ks = jax.random.split(key, args.best_of)
            plans = jax.vmap(
                lambda k: sampler(student, ctx[None], k, (1, H, 4))[0]
            )(ks)  # (K, H, 4)

            def score(u_n):
                u = unnormalize(in_stats, u_n)
                xs, c = rollout_with_cost(plant, cost, x0, u)
                clear = min_clearance_jax(xs)
                return c + 1e5 * jnp.maximum(-clear, 0.0)

            return plans[jnp.argmin(jax.vmap(score)(plans))]

        return jax.vmap(per_row)(x0s, ctx_norm, keys)

    rng = np.random.RandomState(7)
    ctx_chunks, u_chunks = [], []
    for _ in range(-(-args.n_pairs // args.gen_batch)):
        idx = jnp.asarray(rng.randint(0, n_pool, args.gen_batch))
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(idx)
        ctx = ds.condition_normalized[idx]
        u_chunks.append(np.asarray(gen_chunk(ds.condition[idx], ctx, keys)))
        ctx_chunks.append(np.asarray(ctx))
    data_c = jnp.asarray(np.concatenate(ctx_chunks)[:args.n_pairs])
    data_u = jnp.asarray(np.concatenate(u_chunks)[:args.n_pairs])
    print(f"[gen] {data_u.shape[0]} best-of-{args.best_of} pairs from the "
          f"{len(times)}-eval guided student in {time.time() - t0:.0f}s",
          flush=True)

    # ---------- 2) regress ----------
    model = AMPCNet(horizon=H, control_dim=4, hidden=(128, 128, 128))

    def train_mlp(inputs, conds, seed):
        return fit_mlp_regression(
            model, inputs, conds, steps=args.steps, chunk=args.chunk,
            batch_size=args.batch_size, lr=args.lr,
            ema_decay=args.ema_decay, seed=seed)

    print("[train] amortized (guided-student pairs)", flush=True)
    mlp_amort, mse_a = train_mlp(data_u, data_c, seed=30)
    print("[train] direct (expert dataset, the reference baseline)", flush=True)
    mlp_direct, mse_d = train_mlp(ds.inputs_normalized, ds.condition_normalized,
                                  seed=30)

    # ---------- 3) 64-start closed-loop eval ----------
    ev_j = jnp.asarray(eval_start_states(args.eval_starts, seed=97))
    ampc_loop = make_ampc_closed_loop(
        model.apply, in_stats, c_stats, plant, cost, n_steps=args.eval_steps)

    eval_jit = jax.jit(jax.vmap(ampc_loop, in_axes=(None, 0)))

    def eval_mlp(params):
        runs = eval_jit(params, ev_j)
        return track_metrics(runs.x_track, runs.stage_costs)

    m_a = eval_mlp(mlp_amort)
    m_d = eval_mlp(mlp_direct)
    print(f"[eval] amortized: CF {m_a['collision_free_fraction']:.3f} reach "
          f"{m_a['goal_reach_fraction_0.5']:.3f}", flush=True)
    print(f"[eval] direct:    CF {m_d['collision_free_fraction']:.3f} reach "
          f"{m_d['goal_reach_fraction_0.5']:.3f}", flush=True)

    report = {
        "student": os.path.join(args.student_dir,
                                f"student_{args.evals}eval.pkl"),
        "times": times,
        "n_pairs": int(data_u.shape[0]),
        "n_starts": args.eval_starts,
        "final_mse_amortized": mse_a,
        "final_mse_direct": mse_d,
        "amortized_mlp": m_a,
        "direct_mlp_reference_baseline": m_d,
        "student_wide_eval_for_reference": rec,
    }
    with open(os.path.join(args.out, "mlp_amortized.pkl"), "wb") as f:
        pickle.dump(mlp_amort, f)
    with open(os.path.join(args.out, "mlp_direct.pkl"), "wb") as f:
        pickle.dump(mlp_direct, f)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
