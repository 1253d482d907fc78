"""Acrobot long-horizon fidelity + modality diagnosis (VERDICT r4 missing #2).

The reference's acrobot expert solves N=256-step OCPs over 400 control steps
(`/root/reference/scripts/mpc_data_collecting/Acrobots/acrobots_nmpc.py:28-60`);
the flagship artifact runs the repo-standard 80-step / horizon-32 protocol.
Two questions, both answered by measurement:

1. **Does horizon 32 suffice?** Run the iLQR NMPC expert at horizon 32 AND
   horizon 256 over the reference's 400 control steps from the flagship's
   eval start (plus the collection-grid corners): the shipped acrobot task
   is REGULATION to the down-rest equilibrium (acrobot_cost targets zeros,
   `dynamics/acrobot.py:81-90`), so plans beyond the settling time should
   buy nothing. The diffusion controller (horizon-32 model, committed EMA)
   is also run at 400 steps to show reference-length episode stability.

2. **Why `modality: {left: 10, right: 0}`?** `count_swing_modes` reads
   state index 2 with the CART-POLE convention (theta). In the acrobot
   layout (theta1, theta2, dtheta1, dtheta2, theta1*, theta2*) index 2 is a
   joint VELOCITY, which ends ~0 < pi for every converged run — the row is
   definitionally all-"left" and carries no modality information. The
   meaningful check (final theta1: sign and distance to the target 0) is
   computed here from the committed EMA params.

Writes artifacts/flagship_acrobot/horizon_diagnosis.json.
Needs dataset.npz (regen: `flagship_run.py --plant acrobot --collect-only
--grid-pos 8 --grid-theta 8 --steps 40 --noisy 5 --train-steps 60000
--out artifacts/flagship_acrobot`).
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
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--art", default="artifacts/flagship_acrobot")
    p.add_argument("--steps", type=int, default=400,
                   help="reference episode length (acrobots_nmpc.py:57)")
    p.add_argument("--horizons", type=int, nargs="+", default=[32, 256])
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_via_diffusion_model_tpu.control import (
        make_closed_loop, make_nmpc_closed_loop)
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.data.generation import make_acrobot_grid
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig

    plant, cost = get_plant("acrobot")
    ds = ControlSequenceDataset.load(os.path.join(args.art, "dataset.npz"))
    with open(os.path.join(args.art, "ema_params.pkl"), "rb") as f:
        ema = pickle.load(f)
    if isinstance(ema, dict) and "ema_params" in ema:
        # flagship_run wraps the EMA tree with step/cfg metadata
        ema = ema["ema_params"]

    # the flagship's eval start + the collection-grid corners
    x0_eval = np.asarray(make_acrobot_grid([0.7], [-0.7])[0])
    corners = np.asarray(make_acrobot_grid([-np.pi / 2, np.pi / 2],
                                           [-np.pi / 2, np.pi / 2]))
    starts = np.concatenate([x0_eval[None], corners], axis=0)  # (5, 6)

    report = {"n_steps": args.steps, "starts": starts[:, :2].tolist(),
              "expert": {}}

    # ---- 1) expert horizon sweep over the reference's 400 steps ----
    for h in args.horizons:
        # iterations scale with horizon: a 256-step OCP at the 32-step
        # budget (25 iters) is badly under-converged (first run measured
        # h256 costs ~8x h32's — solver budget, not horizon truth)
        iters = max(25, h // 2)
        nmpc = jax.jit(jax.vmap(make_nmpc_closed_loop(
            plant, cost, ILQRConfig(horizon=h, n_iterations=iters),
            n_steps=args.steps, u_init_scale=40.0)))
        t0 = time.time()
        runs = nmpc(jnp.asarray(starts))
        costs = np.asarray(runs.stage_costs.sum(axis=1))
        report["expert"][f"horizon_{h}"] = {
            "n_iterations": iters,
            "closed_loop_costs": [round(float(c), 2) for c in costs],
            "mean": round(float(costs.mean()), 2),
            "seconds": round(time.time() - t0, 1),
        }
        print(f"[expert h={h}] costs {np.round(costs, 1).tolist()} "
              f"({time.time() - t0:.0f}s)", flush=True)
    h_lo, h_hi = args.horizons[0], args.horizons[-1]
    lo = np.asarray(report["expert"][f"horizon_{h_lo}"]["closed_loop_costs"])
    hi = np.asarray(report["expert"][f"horizon_{h_hi}"]["closed_loop_costs"])
    report["expert"]["max_cost_ratio_lo_over_hi"] = round(
        float(np.max(lo / hi)), 4)

    # ---- 2) diffusion controller at reference episode length ----
    model = TemporalUnet(state_dim=1, n_support_points=32, unet_input_dim=32,
                         dim_mults=UNET_DIM_MULTS[0], context_dim=6,
                         conditioning_type="default", cfg_indicator=True)
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 25))
    loop = jax.jit(jax.vmap(
        lambda k: make_closed_loop(
            diffusion, model.apply, ds.normalizer.stats["inputs"],
            ds.normalizer.stats["condition"], plant, cost, horizon=32,
            n_steps=args.steps, w=0.01, n_diffusion_steps_without_noise=5,
        )(ema, jnp.asarray(x0_eval), k)))
    keys = jax.random.split(jax.random.PRNGKey(7), args.seeds)
    t0 = time.time()
    runs = loop(keys)
    xtr = np.asarray(runs.x_track)  # (seeds, steps+1, 6)
    dcosts = np.asarray(runs.stage_costs.sum(axis=1))
    exp_cost = float(hi[0])  # horizon-256 expert from the same start
    report["diffusion_400step"] = {
        "mean_cost": round(float(dcosts.mean()), 2),
        "ratio_vs_h256_expert": round(float(dcosts.mean()) / exp_cost, 4),
        "all_finite": bool(np.all(np.isfinite(xtr))),
        "seconds": round(time.time() - t0, 1),
    }
    print(f"[diffusion 400-step] mean {dcosts.mean():.1f} vs h256 expert "
          f"{exp_cost:.1f}", flush=True)

    # ---- 3) the REAL modality row: final theta1 (state index 0) ----
    t1_final = xtr[:, -1, 0]
    report["modality_theta1"] = {
        "convention_note": "report.json's modality row reads index 2 with "
                           "the cart-pole convention; for the acrobot that "
                           "is dtheta1 (a velocity ~0 < pi) — all-'left' by "
                           "construction. This row reads theta1 itself.",
        "final_theta1": [round(float(v), 4) for v in t1_final],
        "max_abs_final_theta1": round(float(np.max(np.abs(t1_final))), 4),
        "sign_counts": {"neg": int(np.sum(t1_final < 0)),
                        "pos": int(np.sum(t1_final >= 0))},
    }

    out = os.path.join(args.art, "horizon_diagnosis.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
