"""Plotting utilities (headless matplotlib).

Rebuild of `mpd/plotting/base.py` (save_fig png+pdf, confidence ellipse,
mean-CI) plus the closed-loop comparison panels the reference's inference
scripts draw (`Diffusion_MPC_Inference.py:430-480`: per-state tracks of
diffusion vs MPC, input overlay) and the 2-D planning render
(trajectories over the obstacle field)."""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Circle, Ellipse, Rectangle

__all__ = [
    "save_fig",
    "confidence_ellipse",
    "plot_mean_ci",
    "plot_closed_loop_comparison",
    "plot_planning_env",
]


def save_fig(fig, path_no_ext: str, dpi: int = 150) -> None:
    """png + pdf (reference `plotting/base.py:10-15`)."""
    os.makedirs(os.path.dirname(path_no_ext) or ".", exist_ok=True)
    fig.savefig(path_no_ext + ".png", dpi=dpi, bbox_inches="tight")
    fig.savefig(path_no_ext + ".pdf", bbox_inches="tight")


def confidence_ellipse(x, y, ax, n_std: float = 3.0, facecolor="none", **kwargs):
    """Covariance confidence ellipse (reference `plotting/base.py:80-130`)."""
    x, y = np.asarray(x), np.asarray(y)
    cov = np.cov(x, y)
    pearson = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1] + 1e-12)
    rx, ry = np.sqrt(1 + pearson), np.sqrt(1 - pearson)
    ellipse = Ellipse((0, 0), width=rx * 2, height=ry * 2, facecolor=facecolor, **kwargs)
    sx, sy = np.sqrt(cov[0, 0]) * n_std, np.sqrt(cov[1, 1]) * n_std
    transf = (
        matplotlib.transforms.Affine2D()
        .rotate_deg(45)
        .scale(sx, sy)
        .translate(np.mean(x), np.mean(y))
    )
    ellipse.set_transform(transf + ax.transData)
    return ax.add_patch(ellipse)


def plot_mean_ci(ax, xs, ys, label: Optional[str] = None, ci: float = 1.96, **kwargs):
    """Mean line + CI band over runs (reference `plotting/base.py:133-139`).
    ys: (n_runs, T)."""
    ys = np.asarray(ys)
    mean = ys.mean(axis=0)
    se = ys.std(axis=0) / np.sqrt(ys.shape[0])
    line = ax.plot(xs, mean, label=label, **kwargs)
    ax.fill_between(xs, mean - ci * se, mean + ci * se, alpha=0.2, color=line[0].get_color())
    return line


def plot_closed_loop_comparison(
    x_tracks: Sequence[np.ndarray],
    u_tracks: Sequence[np.ndarray],
    labels: Sequence[str],
    state_names: Optional[Sequence[str]] = None,
    dt: float = 0.01,
):
    """N-panel state + input comparison (the reference's 5-panel figure,
    `Diffusion_MPC_Inference.py:430-480`)."""
    n_states = x_tracks[0].shape[1]
    state_names = state_names or [f"x{i}" for i in range(n_states)]
    fig, axes = plt.subplots(n_states + 1, 1, figsize=(8, 2 * (n_states + 1)), sharex=True)
    for i in range(n_states):
        for xt, lab in zip(x_tracks, labels):
            axes[i].plot(np.arange(xt.shape[0]) * dt, xt[:, i], label=lab)
        axes[i].set_ylabel(state_names[i])
        axes[i].legend(fontsize=7)
    for ut, lab in zip(u_tracks, labels):
        axes[-1].step(np.arange(ut.shape[0]) * dt, ut[:, 0], where="post", label=lab)
    axes[-1].set_ylabel("u")
    axes[-1].set_xlabel("t [s]")
    axes[-1].legend(fontsize=7)
    fig.tight_layout()
    return fig


def plot_planning_env(env, trajs: Optional[np.ndarray] = None, best_idx: Optional[int] = None):
    """Render the 2-D obstacle field + sampled trajectories."""
    fig, ax = plt.subplots(figsize=(6, 6))
    for c in np.asarray(env.circles):
        ax.add_patch(Circle((c[0], c[1]), c[2], color="tab:gray", alpha=0.6))
    for b in np.asarray(env.boxes):
        ax.add_patch(
            Rectangle((b[0] - b[2], b[1] - b[3]), 2 * b[2], 2 * b[3], color="tab:gray", alpha=0.6)
        )
    if trajs is not None:
        trajs = np.asarray(trajs)
        for i, tr in enumerate(trajs):
            ax.plot(tr[:, 0], tr[:, 1], alpha=0.35, color="tab:blue", lw=1)
        if best_idx is not None:
            ax.plot(trajs[best_idx, :, 0], trajs[best_idx, :, 1], color="tab:red", lw=2)
        ax.scatter(*trajs[0, 0], color="green", zorder=5, label="start")
        ax.scatter(*trajs[0, -1], color="purple", zorder=5, label="goal")
        ax.legend()
    lim = float(getattr(env, "limits", 1.0))
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    return fig


def plot_planning_env_3d(world, ee_paths: Optional[np.ndarray] = None,
                         best_idx: Optional[int] = None):
    """Render a 3-D sphere/box world + end-effector paths of sampled arm
    plans (`envs/planning3d`; the reference renders its 3-D planning runs
    through torch_robotics visualizers, `inference_(mpd).py:306-343`)."""
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")
    u, v = np.mgrid[0: 2 * np.pi: 18j, 0: np.pi: 10j]
    for s in np.asarray(world.spheres):
        ax.plot_surface(s[0] + s[3] * np.cos(u) * np.sin(v),
                        s[1] + s[3] * np.sin(u) * np.sin(v),
                        s[2] + s[3] * np.cos(v),
                        color="tab:gray", alpha=0.35, linewidth=0)
    for b in np.asarray(world.boxes):
        c, h = b[:3], b[3:6]
        corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)]) * h + c
        edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
                 (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]
        for i, j in edges:
            ax.plot(*zip(corners[i], corners[j]), color="tab:gray",
                    alpha=0.5, lw=1)
    if ee_paths is not None:
        ee_paths = np.asarray(ee_paths)
        for tr in ee_paths:
            ax.plot(tr[:, 0], tr[:, 1], tr[:, 2], alpha=0.3,
                    color="tab:blue", lw=1)
        if best_idx is not None:
            bt = ee_paths[best_idx]
            ax.plot(bt[:, 0], bt[:, 1], bt[:, 2], color="tab:red", lw=2)
        ax.scatter(*ee_paths[0, 0], color="green", s=40, label="start EE")
        ax.scatter(*ee_paths[0, -1], color="purple", s=40, label="goal EE")
        ax.legend()
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    return fig
