"""Performance-plot CLI.

Rebuild of `scripts/performance_plot/` + `scripts/Panda/efficiency_plot/`:
- cost-difference-per-step plot (diffusion vs MPC closed-loop quadratic
  costs, `Cost_Difference_Plot.py:10-79`),
- u-MSE across a checkpoint sweep (`U_2406400_Models_Difference_Plot.py:
  10-40`),
- compute-time box plots (diffusion vs NMPC, `box_plot.py:5-60`),
- the theta* function plot (`theta_star_plot.py:4-23`).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c1 = sub.add_parser("cost-diff", help="per-step cost difference from saved tracks")
    c1.add_argument("--diffusion-costs", required=True, help=".npy of per-step costs")
    c1.add_argument("--mpc-costs", required=True)
    c1.add_argument("--out", default="logs/plots/cost_diff")

    c2 = sub.add_parser("ckpt-sweep", help="u-MSE vs expert across checkpoints")
    c2.add_argument("--u-expert", required=True, help=".npy expert u track")
    c2.add_argument("--u-checkpoints", nargs="+", required=True, help=".npy per checkpoint")
    c2.add_argument("--out", default="logs/plots/ckpt_sweep")

    c3 = sub.add_parser("time-box", help="compute-time box plot")
    c3.add_argument("--diffusion-times", required=True)
    c3.add_argument("--mpc-times", required=True)
    c3.add_argument("--out", default="logs/plots/time_box")

    c4 = sub.add_parser("theta-star", help="plot the virtual angle map")
    c4.add_argument("--out", default="logs/plots/theta_star")

    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mpc_via_diffusion_model_tpu.eval.plotting import save_fig

    if args.cmd == "cost-diff":
        cd = np.load(args.diffusion_costs)
        cm = np.load(args.mpc_costs)
        n = min(len(cd), len(cm))
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(cd[:n] - cm[:n])
        ax.set_xlabel("control step")
        ax.set_ylabel("cost(diffusion) - cost(MPC)")
        save_fig(fig, args.out)
    elif args.cmd == "ckpt-sweep":
        u_exp = np.load(args.u_expert).ravel()
        mses = []
        for path in args.u_checkpoints:
            u = np.load(path).ravel()
            n = min(len(u), len(u_exp))
            mses.append(float(np.mean((u[:n] - u_exp[:n]) ** 2)))
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(mses, marker="o")
        ax.set_xlabel("checkpoint index")
        ax.set_ylabel("u MSE vs expert")
        save_fig(fig, args.out)
    elif args.cmd == "time-box":
        td = np.load(args.diffusion_times)
        tm = np.load(args.mpc_times)
        fig, ax = plt.subplots(figsize=(6, 4))
        bp = ax.boxplot([td, tm], labels=["diffusion", "NMPC"])
        for i, data in enumerate([td, tm], start=1):
            ax.annotate(f"median {np.median(data) * 1e3:.2f} ms", (i, np.median(data)))
        ax.set_ylabel("compute time [s]")
        save_fig(fig, args.out)
    elif args.cmd == "theta-star":
        theta = np.linspace(0, 2 * np.pi, 400)
        theta_star = (theta - np.pi) ** 2 / (-np.pi) + np.pi
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(theta, theta_star)
        ax.set_xlabel("theta")
        ax.set_ylabel("theta*")
        save_fig(fig, args.out)
    print(f"saved {args.out}.png/.pdf")


if __name__ == "__main__":
    main()
