"""Expert data-collection CLI.

Replaces `scripts/mpc_data_collecting/*` (`nmpc_multi_process_collect_data.py`,
`cart_pole_lmpc_collecting.py`, `noisy_data_collecting.py`): batched
on-device closed-loop iLQR collection over an initial-state grid with
Gaussian-noise replicas and +/- kick guesses.

Example (the reference's flagship NMPC dataset shape, scaled by --scale):
  python scripts/collect_data.py --plant cartpole_virtual_swingup \
      --pos-range -1 1 10 --theta-range 2.356 3.927 20 \
      --horizon 64 --steps 80 --noisy 20 --out data/cartpole_nmpc.npz
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--plant", default="cartpole_virtual_swingup")
    p.add_argument("--pos-range", nargs=3, type=float, default=[-1.0, 1.0, 10])
    p.add_argument("--theta-range", nargs=3, type=float, default=[3 * np.pi / 4, 5 * np.pi / 4, 20])
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--steps", type=int, default=80, help="closed-loop control steps per group")
    p.add_argument("--noisy", type=int, default=20, help="noisy replicas per step")
    p.add_argument("--noise-std", type=float, default=0.15)
    p.add_argument("--kicks", nargs="*", type=float, default=[5.0, -5.0])
    p.add_argument("--solver-iters", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax
    from mpc_via_diffusion_model_tpu.data.generation import (
        collect_closed_loop_dataset,
        make_initial_state_grid,
    )
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, theta_to_red_theta

    plant, cost = get_plant(args.plant)
    theta_to_virtual = theta_to_red_theta if plant.state_dim >= 5 else None
    grid = make_initial_state_grid(
        np.linspace(*args.pos_range[:2], int(args.pos_range[2])),
        np.linspace(*args.theta_range[:2], int(args.theta_range[2])),
        state_dim=plant.state_dim,
        theta_to_virtual=theta_to_virtual,
    )
    n_total = len(grid) * len(args.kicks) * args.steps * (1 + args.noisy)
    print(f"grid {grid.shape}, kicks {args.kicks} -> {n_total} (x0, u-horizon) samples")

    t0 = time.time()
    ds = collect_closed_loop_dataset(
        plant, cost, grid,
        horizon=args.horizon, n_control_steps=args.steps,
        solver_iterations=args.solver_iters, u_kick_scales=tuple(args.kicks),
        noise_std=args.noise_std, n_noisy=args.noisy,
        key=jax.random.PRNGKey(args.seed),
    )
    dt = time.time() - t0
    ds.save(args.out)
    print(f"saved {ds.n_init} samples to {args.out} in {dt:.1f}s "
          f"({ds.n_init / dt:.0f} OCP solves/s)")


if __name__ == "__main__":
    main()
