"""3D Panda end-effector trajectory plot from a flagship arm artifact.

The reference commits 3D Panda trajectory figures from its MuJoCo runs
(`scripts/Panda/panda_inference/` plotting cells); this renders the same
view for this engine: the end-effector path of the diffusion controller vs
the NMPC expert, computed by the real modified-DH forward kinematics from
the saved joint tracks.

Usage: python scripts/plot_panda_3d.py [--art artifacts/flagship_panda_rbd]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--art", default="artifacts/flagship_panda_rbd")
    p.add_argument("--rbd", action="store_true", default=None,
                   help="states are ready-pose-shifted (panda_rbd); inferred "
                        "from the artifact path by default")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mpc_via_diffusion_model_tpu.dynamics import panda_fk
    from mpc_via_diffusion_model_tpu.dynamics.arm import PANDA_READY_POSE
    from mpc_via_diffusion_model_tpu.eval.plotting import save_fig

    rbd = args.rbd if args.rbd is not None else ("rbd" in args.art)
    q_off = np.asarray(PANDA_READY_POSE, np.float32) if rbd else 0.0

    x_d = np.load(os.path.join(args.art, "x_diffusion.npy"))  # (seeds, T+1, 14)
    x_m = np.load(os.path.join(args.art, "x_mpc.npy"))        # (T+1, 14)
    if x_d.ndim == 2:
        x_d = x_d[None]
    fk = jax.jit(jax.vmap(panda_fk))

    def ee_path(x):  # (T+1, 14) -> (T+1, 3)
        return np.asarray(fk(jnp.asarray(x[:, :7] + q_off)))

    ee_m = ee_path(x_m)
    ee_ds = [ee_path(x_d[i]) for i in range(min(x_d.shape[0], 5))]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(111, projection="3d")
    for i, ee in enumerate(ee_ds):
        ax.plot(ee[:, 0], ee[:, 1], ee[:, 2], lw=1.2, alpha=0.8,
                label="diffusion" if i == 0 else None)
    ax.plot(ee_m[:, 0], ee_m[:, 1], ee_m[:, 2], "k--", lw=2.0, label="NMPC expert")
    ax.scatter(*ee_m[0], c="g", s=50, label="start")
    ax.scatter(*ee_m[-1], c="r", s=50, label="target")
    ax.set_xlabel("x [m]"); ax.set_ylabel("y [m]"); ax.set_zlabel("z [m]")
    ax.set_title("Panda end-effector path: diffusion controller vs NMPC")
    ax.legend()
    save_fig(fig, os.path.join(args.art, "ee_3d"))
    print("wrote", os.path.join(args.art, "ee_3d.png"),
          f"(spread across seeds at final step: "
          f"{np.std([e[-1] for e in ee_ds], axis=0).max():.4f} m)")


if __name__ == "__main__":
    main()
