"""Amortize the distilled diffusion policy into the AMPC MLP (zero-eval).

The reference's own NN baseline (`NN_cart_pole_train.py:32-51` +
`NMPC_NN_Inference.py`) regresses the expert dataset directly — and the
flagship task is MULTI-MODAL (overlapping +/- kick expert data at identical
states, artifacts/flagship_modality), so direct regression averages modes.
This script closes that gap generatively:

1. draw ONE shared DDIM init and sample the distilled student at that
   FIXED draw over the dataset's visitation states — the student becomes a
   deterministic, MODE-CONSISTENT function of the state (the generative
   model acts as the mode selector);
2. regress the AMPC MLP onto those (state, u-horizon) pairs;
3. evaluate closed-loop vs the iLQR expert on a start grid, with a
   DIRECT-regression MLP (the reference baseline, trained on the same
   budget) as the control arm.

The result is a ~7k-param tanh MLP policy — no diffusion at inference at
all — carrying the diffusion policy's closed-loop behavior: the final rung
of the capability->speed ladder (CFG teacher -> few-eval student -> MLP).

Usage: python scripts/amortize_flagship.py   (artifacts/amortized)
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
    p.add_argument("--teacher", default="artifacts/flagship_modality")
    p.add_argument("--student-art", default="artifacts/distilled")
    p.add_argument("--evals", type=int, default=0,
                   help="which student_{N}eval.pkl to amortize (0 = the "
                        "deepest round in the report)")
    p.add_argument("--out", default="artifacts/amortized")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--n-pairs", type=int, default=65536)
    p.add_argument("--gen-batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ema-decay", type=float, default=0.995)
    p.add_argument("--noise-seed", type=int, default=100,
                   help="seed of the ONE shared DDIM init draw")
    p.add_argument("--eval-steps", type=int, default=80)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        make_ampc_closed_loop, make_nmpc_closed_loop,
    )
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.diffusion.distillation import (
        make_student_ddim_sampler,
    )
    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_collect_cost, get_plant, theta_to_red_theta,
    )
    from mpc_via_diffusion_model_tpu.models import AMPCNet, TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import fit_mlp_regression
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig

    os.makedirs(args.out, exist_ok=True)
    plant, _ = get_plant("cartpole_virtual_swingup")
    cost = cartpole_virtual_collect_cost()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]

    report_s = json.load(open(os.path.join(args.student_art, "report.json")))
    rec = (report_s["rounds"][-1] if args.evals == 0 else
           next(r for r in report_s["rounds"] if r["n_evals"] == args.evals))
    times = rec["times"]
    with open(os.path.join(args.student_art,
                           f"student_{len(times)}eval.pkl"), "rb") as f:
        student = pickle.load(f)

    H = args.horizon
    unet = TemporalUnet(
        state_dim=1, n_support_points=H, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=5, conditioning_type="default",
        cfg_indicator=True,
    )
    schedule = make_schedule("exponential", 25)
    sampler = make_student_ddim_sampler(schedule, unet.apply, times)

    # ---------- 1) mode-consistent pairs from the frozen student ----------
    t0 = time.time()
    eps0 = jax.random.normal(jax.random.PRNGKey(args.noise_seed), (1, H, 1))
    n_pool = ds.condition_normalized.shape[0]

    @jax.jit
    def gen_chunk(ctx_norm):
        return sampler(student, ctx_norm, jax.random.PRNGKey(0),
                       (ctx_norm.shape[0], H, 1), x_init=eps0)

    rng = np.random.RandomState(7)
    ctx_chunks, u_chunks = [], []
    n_chunks = -(-args.n_pairs // args.gen_batch)  # one jit signature
    for _ in range(n_chunks):
        idx = rng.randint(0, n_pool, args.gen_batch)
        ctx = ds.condition_normalized[jnp.asarray(idx)]
        u_chunks.append(np.asarray(gen_chunk(ctx)))
        ctx_chunks.append(np.asarray(ctx))
    data_c = jnp.asarray(np.concatenate(ctx_chunks)[:args.n_pairs])
    data_u = jnp.asarray(np.concatenate(u_chunks)[:args.n_pairs])
    print(f"[gen] {data_u.shape[0]} mode-consistent pairs from the "
          f"{len(times)}-eval student in {time.time() - t0:.0f}s", flush=True)

    # ---------- 2) regress the MLPs (scanned chunks, one dispatch each) ---
    # two architectures x two data sources:
    #   ref:  the reference's exact 5->2->50->50->H net (2-unit bottleneck)
    #   wide: capacity-unconstrained 5->128->128->128->H
    archs = {
        "ref": AMPCNet(horizon=H, control_dim=1),
        "wide": AMPCNet(horizon=H, control_dim=1, hidden=(128, 128, 128)),
    }

    def train_mlp(model, inputs, conds, seed):
        return fit_mlp_regression(
            model, inputs, conds, steps=args.steps, chunk=args.chunk,
            batch_size=args.batch_size, lr=args.lr,
            ema_decay=args.ema_decay, seed=seed, verbose=True)

    trained = {}
    for arch_name, model in archs.items():
        print(f"[train] {arch_name} MLP on amortized student pairs", flush=True)
        trained[f"amortized_{arch_name}"] = (
            model, *train_mlp(model, data_u, data_c, seed=30))
        print(f"[train] {arch_name} MLP directly on the expert dataset "
              f"(the reference baseline)", flush=True)
        trained[f"direct_{arch_name}"] = (
            model, *train_mlp(model, ds.inputs_normalized,
                              ds.condition_normalized, seed=30))

    # ---------- 3) closed-loop eval on a start grid ----------
    start_grid = []
    for pos in (-0.25, 0.0, 0.25):
        for theta in (3.0, float(np.pi), 3.3):
            start_grid.append([pos, 0.0, theta, 0.0,
                               float(theta_to_red_theta(theta))])
    starts = jnp.asarray(start_grid, jnp.float32)

    nmpc = jax.jit(make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=H, n_iterations=25),
        n_steps=args.eval_steps, u_init_scale=5.0, warm_start=False))
    expert_costs = np.asarray(jax.jit(jax.vmap(
        lambda x0: nmpc(x0).stage_costs.sum()))(starts))

    def summarize(costs):
        ratio = costs / expert_costs
        return {
            "cost_mean": float(costs.mean()),
            "ratio_mean": float(ratio.mean()),
            "ratio_max": float(ratio.max()),
            "ratios": [round(float(r), 4) for r in ratio],
        }

    report = {
        "student": os.path.join(args.student_art,
                                f"student_{len(times)}eval.pkl"),
        "times": times,
        "n_pairs": int(data_u.shape[0]),
        "n_starts": int(starts.shape[0]),
        "expert_cost_mean": float(expert_costs.mean()),
    }
    eval_cache = {}  # one jitted program per arch; params is a runtime arg
    for name, (model, params, mse) in trained.items():
        if model.hidden not in eval_cache:
            ampc_loop = make_ampc_closed_loop(
                model.apply, in_stats, c_stats, plant, cost,
                n_steps=args.eval_steps)
            eval_cache[model.hidden] = jax.jit(
                jax.vmap(ampc_loop, in_axes=(None, 0)))
        runs = eval_cache[model.hidden](params, starts)
        costs = np.asarray(runs.stage_costs.sum(axis=1))
        report[name] = {"final_mse": mse, **summarize(costs)}
        print(f"[eval] {name}: ratio_mean "
              f"{report[name]['ratio_mean']:.4f}", flush=True)
        with open(os.path.join(args.out, f"mlp_{name}.pkl"), "wb") as f:
            pickle.dump(params, f)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
