"""Benchmark the amortized 0-eval MLP policies on TPU.

For each mlp_*.pkl in the amortization artifact
(scripts/amortize_flagship.py), times the whole closed loop
(`control.make_ampc_closed_loop` — one jitted scan, one dispatch per
episode) at the sustained long-episode protocol and the 80-step pipelined
protocol, and re-checks the closed-loop cost ratio vs the iLQR expert at
the bench start. One JSON line per row.

Usage: python scripts/bench_amortized.py
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
    p.add_argument("--art", default="artifacts/amortized")
    p.add_argument("--teacher", default="artifacts/flagship_modality")
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--sustained-steps", type=int, default=800)
    p.add_argument("--fleet", type=int, default=256,
                   help="serving-fleet size for the aggregate steps/s row "
                        "(0 disables)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        make_ampc_closed_loop, make_nmpc_closed_loop,
    )
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.dynamics import (
        cartpole_virtual_collect_cost, get_plant, theta_to_red_theta,
    )
    from mpc_via_diffusion_model_tpu.models import AMPCNet
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig

    plant, _ = get_plant("cartpole_virtual_swingup")
    cost = cartpole_virtual_collect_cost()
    ds = ControlSequenceDataset.load(os.path.join(args.teacher, "dataset.npz"))
    in_stats = ds.normalizer.stats["inputs"]
    c_stats = ds.normalizer.stats["condition"]
    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])

    nmpc = jax.jit(make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=args.horizon, n_iterations=25),
        n_steps=args.steps, u_init_scale=5.0, warm_start=False))
    expert_cost = float(np.asarray(nmpc(x0).stage_costs).sum())

    def arch_from_params(params):
        """Recover the MLP architecture from the checkpoint itself (the
        Dense_i kernel shapes fully determine it) — filename conventions
        differ across the amortize_* scripts and must not pick the arch."""
        dense = params["params"]
        names = sorted(dense, key=lambda s: int(s.split("_")[1]))
        in_dim = int(dense[names[0]]["kernel"].shape[0])
        widths = [int(dense[n]["kernel"].shape[1]) for n in names]
        if widths[-1] % args.horizon != 0:
            return None, in_dim
        return AMPCNet(horizon=args.horizon,
                       control_dim=widths[-1] // args.horizon,
                       hidden=tuple(widths[:-1])), in_dim

    # one jitted program set per architecture — params is a runtime arg, so
    # checkpoints sharing an arch must not pay the 1-5 min remote re-compile
    loops_cache = {}
    for pkl in sorted(os.listdir(args.art)):
        if not (pkl.startswith("mlp_") and pkl.endswith(".pkl")):
            continue
        name = pkl[len("mlp_"):-len(".pkl")]
        with open(os.path.join(args.art, pkl), "rb") as f:
            params = pickle.load(f)
        model, in_dim = arch_from_params(params)
        if model is None or in_dim != x0.shape[0]:
            why = (f"output width not divisible by horizon {args.horizon}"
                   if model is None else
                   f"input dim {in_dim} != cart-pole state dim {x0.shape[0]}")
            print(json.dumps({
                "metric": f"amortized_{name}_closed_loop_hz", "value": None,
                "skipped": f"not a horizon-{args.horizon} cart-pole policy "
                           f"({why})"}), flush=True)
            continue

        key = (model.hidden, model.control_dim)
        if key not in loops_cache:
            loops_cache[key] = (
                jax.jit(make_ampc_closed_loop(
                    model.apply, in_stats, c_stats, plant, cost,
                    n_steps=args.steps)),
                jax.jit(make_ampc_closed_loop(
                    model.apply, in_stats, c_stats, plant, cost,
                    n_steps=args.sustained_steps)),
            )
        loop, loop_long = loops_cache[key]
        res = loop(params, x0)
        jax.block_until_ready(res.x_track)
        cost_ratio = float(np.asarray(res.stage_costs).sum()) / expert_cost
        dts = []
        for b in range(3):
            t0 = time.perf_counter()
            outs = [loop(params, x0) for _ in range(8)]
            jax.block_until_ready([o.x_track for o in outs])
            dts.append((time.perf_counter() - t0) / 8)
        print(json.dumps({
            "metric": f"amortized_{name}_closed_loop_hz",
            "value": round(args.steps / min(dts), 1), "unit": "Hz",
            "cost_ratio_vs_expert": round(cost_ratio, 4),
        }), flush=True)

        jax.block_until_ready(loop_long(params, x0).x_track)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop_long(params, x0).x_track)
            reps.append(time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"amortized_{name}_sustained_hz",
            "value": round(args.sustained_steps / min(reps), 1), "unit": "Hz",
        }), flush=True)

        # serving: a fleet of independent MLP control loops (vmapped over
        # starts) — aggregate control-steps/s one chip serves at 0 evals
        if args.fleet > 0:
            import numpy as _np

            x0f = _np.tile(np.asarray(x0)[None], (args.fleet, 1))
            x0f[:, 0] += _np.random.RandomState(5).uniform(
                -0.5, 0.5, args.fleet)
            x0f = jnp.asarray(x0f, jnp.float32)
            fkey = ("fleet",) + key
            if fkey not in loops_cache:
                loops_cache[fkey] = jax.jit(
                    jax.vmap(loop_long, in_axes=(None, 0)))
            fleet = loops_cache[fkey]
            jax.block_until_ready(fleet(params, x0f).x_track)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fleet(params, x0f).x_track)
                reps.append(time.perf_counter() - t0)
            print(json.dumps({
                "metric": f"amortized_{name}_fleet{args.fleet}_steps_per_sec",
                "value": round(args.fleet * args.sustained_steps / min(reps), 0),
                "unit": "steps/s",
            }), flush=True)


if __name__ == "__main__":
    main()
