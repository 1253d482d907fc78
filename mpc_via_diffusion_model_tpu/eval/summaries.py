"""Training-time summaries: sample-and-evaluate hooks for the trainer.

Rebuild of `mpd/summaries/summary_trajectory_generation.py`
(`SummaryTrajectoryGeneration.summary_fn`): mid-training, sample N
trajectories from the EMA model for a random task, compute planning metrics
(fraction free / collision intensity / success), and hand them to the metric
writer (stdout / JSONL; wandb if available — the reference logs to wandb,
`trainer.py:274`, disabled by default)."""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

__all__ = ["MetricsWriter", "make_trajectory_summary"]


class MetricsWriter:
    """Structured metrics sink: JSONL file + stdout (+ wandb when installed
    and enabled). Replaces the reference's print-spray + wandb.log mix."""

    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False, run_name: str = "run"):
        self.log_dir = log_dir
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project="mpc_via_diffusion_model_tpu", name=run_name)
                self._wandb = wandb
            except Exception:
                self._wandb = None  # wandb not installed / no network: degrade

    def log(self, metrics: Dict, step: int) -> None:
        record = {"step": int(step), "time": time.time(), **{
            k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
            for k, v in metrics.items()
        }}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, fig, step: int) -> None:
        """Log a matplotlib figure: wandb.Image when wandb is live (the
        reference renders sampled joint-space trajectories into the logger,
        `summary_trajectory_generation.py:60-84`), and a PNG under
        ``log_dir/images/`` always (so headless runs keep the artifact)."""
        if self.log_dir:
            img_dir = os.path.join(self.log_dir, "images")
            os.makedirs(img_dir, exist_ok=True)
            fig.savefig(os.path.join(img_dir, f"{name}_step{int(step):07d}.png"),
                        dpi=120, bbox_inches="tight")
        if self._wandb:
            self._wandb.log({name: self._wandb.Image(fig)}, step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    # Context-manager protocol so `with MetricsWriter(...) as mw:` cleans up
    # the JSONL handle even on exceptions; Trainer.fit also closes its own
    # writer in a finally block.
    def __enter__(self) -> "MetricsWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.close()


def make_trajectory_summary(
    diffusion,
    apply_fn: Callable,
    dataset,
    n_samples: int = 25,
    n_diffusion_steps_without_noise: int = 5,
    image_writer: Optional["MetricsWriter"] = None,
):
    """Build ``summary(params, key, step=None) -> dict`` sampling n
    trajectories for a random dataset task and scoring them (reference
    `summary_trajectory_generation.py:16-97`).

    With ``image_writer`` the sampled trajectories are ALSO rendered over the
    planning env (shortest collision-free one highlighted) and logged via
    `MetricsWriter.log_image` — the reference's wandb joint-space render
    (`summary_trajectory_generation.py:60-84`). ``step`` is the TRAINING step
    (Trainer.fit passes it): wandb requires logged steps to be monotonic
    across metrics and images, so images must carry the same step axis as the
    scalar metrics. A call counter is only the fallback for direct calls."""
    from ..eval.planning_metrics import get_best_index, planning_metrics

    horizon = dataset.n_support_points
    d = dataset.state_dim

    def sample(params, hard_conds, key):
        denoise = lambda x, t, c, m: apply_fn(params, x, t)
        return diffusion.ddpm_sample(
            denoise, (n_samples, horizon, d), key, hard_conds=hard_conds,
            n_diffusion_steps_without_noise=n_diffusion_steps_without_noise,
        )

    sample_jit = jax.jit(sample)

    n_calls = [0]

    def summary(params, key, step: Optional[int] = None) -> Dict[str, float]:
        k_task, k_sample = jax.random.split(key)
        idx = int(jax.random.randint(k_task, (), 0, len(dataset)))
        start = dataset.trajs[idx, 0]
        goal = dataset.trajs[idx, -1]
        hard_conds = dataset.get_hard_conditions(start, goal, n_samples=n_samples)
        x_norm = sample_jit(params, hard_conds, k_sample)
        trajs = dataset.unnormalize_trajectories(x_norm)
        n_calls[0] += 1
        if dataset.env is None:
            return {}
        metrics = planning_metrics(dataset.env, trajs)
        if image_writer is not None:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from .plotting import plot_planning_env

            fig = plot_planning_env(dataset.env, np.asarray(trajs),
                                    best_idx=get_best_index(dataset.env, trajs))
            image_writer.log_image(
                "sampled_trajectories", fig,
                step=step if step is not None else n_calls[0])
            plt.close(fig)
        return metrics

    return summary
