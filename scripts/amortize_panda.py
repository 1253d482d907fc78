"""Amortize the panda_rbd distilled student into a 0-eval MLP policy.

Third plant family on the amortization ladder (cart-pole:
amortize_flagship.py, quadrotor: amortize_quadrotor.py): the 3-eval
student (artifacts/distilled_panda, 1.0365x the iLQR expert on true
7-link RNE dynamics) sampled at ONE shared DDIM init over the dataset's
20-dim FK-context visitation states, regressed into a
20 -> 256^3 -> (128x7) MLP. The arm-tracking task is near-unimodal, so the
single-shared-init recipe applies (the quadrotor needed best-of-K; see its
README for the measured contrast).

Evaluated closed-loop on a joint-offset start grid against the 3-eval
student itself (same starts, 2 seeds each) plus the stored iLQR expert /
teacher costs at the canonical x0 (reference protocol
`inference_diffusion_panda.py:28-505`).

Usage: python scripts/amortize_panda.py   (artifacts/amortized_panda)
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
    p.add_argument("--student-dir", default="artifacts/distilled_panda")
    p.add_argument("--evals", type=int, default=3)
    p.add_argument("--out", default="artifacts/amortized_panda")
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--n-pairs", type=int, default=49152)
    p.add_argument("--gen-batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ema-decay", type=float, default=0.995)
    p.add_argument("--noise-seed", type=int, default=100)
    p.add_argument("--eval-steps", type=int, default=80)
    p.add_argument("--eval-starts", type=int, default=5)
    p.add_argument("--student-eval-seeds", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        make_ampc_closed_loop, make_closed_loop,
    )
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, make_panda_context
    from mpc_via_diffusion_model_tpu.models import AMPCNet, TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import fit_mlp_regression

    os.makedirs(args.out, exist_ok=True)
    plant, cost = get_plant("panda")
    to_cond = make_panda_context()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    flagship_report = json.load(open(os.path.join(args.teacher, "report.json")))

    src = json.load(open(os.path.join(args.student_dir, "report.json")))
    rec = next(r for r in src["rounds"] if r["n_evals"] == args.evals)
    times = rec["times"]
    with open(os.path.join(args.student_dir,
                           f"student_{args.evals}eval.pkl"), "rb") as f:
        student = pickle.load(f)

    H = args.horizon
    unet = TemporalUnet(
        state_dim=7, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=20, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    diffusion = GaussianDiffusion(schedule=schedule)
    sampler = make_student_ddim_sampler(schedule, unet.apply, times)

    # ---------- 1) mode-consistent pairs (shared init) ----------
    t0 = time.time()
    eps0 = jax.random.normal(jax.random.PRNGKey(args.noise_seed), (1, H, 7))
    n_pool = ds.condition_normalized.shape[0]

    @jax.jit
    def gen_chunk(ctx_norm):
        return sampler(student, ctx_norm, jax.random.PRNGKey(0),
                       (ctx_norm.shape[0], H, 7), x_init=eps0)

    rng = np.random.RandomState(7)
    ctx_chunks, u_chunks = [], []
    for _ in range(-(-args.n_pairs // args.gen_batch)):
        idx = jnp.asarray(rng.randint(0, n_pool, args.gen_batch))
        ctx = ds.condition_normalized[idx]
        u_chunks.append(np.asarray(gen_chunk(ctx)))
        ctx_chunks.append(np.asarray(ctx))
    data_c = jnp.asarray(np.concatenate(ctx_chunks)[:args.n_pairs])
    data_u = jnp.asarray(np.concatenate(u_chunks)[:args.n_pairs])
    print(f"[gen] {data_u.shape[0]} pairs from the {len(times)}-eval student "
          f"in {time.time() - t0:.0f}s", flush=True)

    # ---------- 2) regress ----------
    model = AMPCNet(horizon=H, control_dim=7, hidden=(256, 256, 256))

    def train_mlp(inputs, conds, seed):
        return fit_mlp_regression(
            model, inputs, conds, steps=args.steps, chunk=args.chunk,
            batch_size=args.batch_size, lr=args.lr,
            ema_decay=args.ema_decay, seed=seed)

    print("[train] amortized (student pairs)", flush=True)
    mlp_amort, mse_a = train_mlp(data_u, data_c, seed=30)
    print("[train] direct (expert dataset baseline)", flush=True)
    mlp_direct, mse_d = train_mlp(ds.inputs_normalized, ds.condition_normalized,
                                  seed=30)

    # ---------- 3) closed-loop eval: MLP vs student on a start grid -------
    srng = np.random.RandomState(11)
    starts = np.tile(np.concatenate([np.full(7, 0.3), np.zeros(7)]),
                     (args.eval_starts, 1)).astype(np.float32)
    starts[1:, :7] += srng.uniform(-0.05, 0.05, (args.eval_starts - 1, 7))
    starts = jnp.asarray(starts)

    ampc_loop = make_ampc_closed_loop(
        model.apply, in_stats, c_stats, plant, cost,
        n_steps=args.eval_steps, state_to_condition=to_cond)

    eval_jit = jax.jit(jax.vmap(ampc_loop, in_axes=(None, 0)))

    def eval_mlp(params):
        runs = eval_jit(params, starts)
        return np.asarray(runs.stage_costs.sum(axis=1))

    costs_a = eval_mlp(mlp_amort)
    costs_d = eval_mlp(mlp_direct)

    s_sampler = lambda ctx, key: sampler(student, ctx, key, (1, H, 7))
    s_loop = jax.jit(make_closed_loop(
        diffusion, unet.apply, in_stats, c_stats, plant, cost,
        horizon=H, n_steps=args.eval_steps, sample_override=s_sampler,
        state_to_condition=to_cond))
    skeys = jax.random.split(jax.random.PRNGKey(7), args.student_eval_seeds)
    s_runs = jax.jit(jax.vmap(lambda x0: jax.vmap(
        lambda k: s_loop(student, x0, k).stage_costs.sum())(skeys)))(starts)
    costs_s = np.asarray(s_runs).mean(axis=1)

    report = {
        "student": os.path.join(args.student_dir,
                                f"student_{args.evals}eval.pkl"),
        "times": times,
        "n_pairs": int(data_u.shape[0]),
        "final_mse_amortized": mse_a,
        "final_mse_direct": mse_d,
        "n_starts": int(starts.shape[0]),
        "expert_cost_at_x0": flagship_report["closed_loop_cost_nmpc"],
        "teacher_cost_at_x0_mean10": flagship_report[
            "closed_loop_cost_diffusion_mean10"],
        "student_costs": [round(float(c), 2) for c in costs_s],
        "amortized_costs": [round(float(c), 2) for c in costs_a],
        "direct_costs": [round(float(c), 2) for c in costs_d],
        "amortized_vs_student_ratio_mean": float((costs_a / costs_s).mean()),
        "direct_vs_student_ratio_mean": float((costs_d / costs_s).mean()),
        "amortized_vs_expert_at_x0": float(
            costs_a[0] / flagship_report["closed_loop_cost_nmpc"]),
        "direct_vs_expert_at_x0": float(
            costs_d[0] / flagship_report["closed_loop_cost_nmpc"]),
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
