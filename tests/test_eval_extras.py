"""Summaries, metrics writer, plotting, data tools, timing harness, DDIM loop."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.eval import MetricsWriter, Timer, time_fn
from mpc_via_diffusion_model_tpu.utils.data_tools import check_dataset, convert_condition_5_to_4


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(log_dir=str(tmp_path))
    w.log({"loss": 0.5, "note": "hi"}, step=10)
    w.log({"loss": 0.25}, step=20)
    w.close()
    lines = open(os.path.join(str(tmp_path), "metrics.jsonl")).read().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 10 and rec["loss"] == 0.5


def test_trajectory_summary_hook(tmp_path):
    from mpc_via_diffusion_model_tpu.data.trajectories import TrajectoryDataset
    from mpc_via_diffusion_model_tpu.envs import ENV_SIMPLE_2D
    from mpc_via_diffusion_model_tpu.eval import make_trajectory_summary
    from mpc_via_diffusion_model_tpu.models import TemporalUnet

    rng = np.random.RandomState(0)
    trajs = rng.uniform(-0.9, 0.9, (12, 16, 2)).astype(np.float32)
    ds = TrajectoryDataset.from_arrays(trajs, env=ENV_SIMPLE_2D)
    model = TemporalUnet(state_dim=2, n_support_points=16, unet_input_dim=8,
                         dim_mults=(1, 2), conditioning_type=None)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 2)), jnp.zeros((1,), jnp.int32))
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 4))
    summary = make_trajectory_summary(diffusion, model.apply, ds, n_samples=4,
                                      n_diffusion_steps_without_noise=1)
    out = summary(params, jax.random.PRNGKey(1))
    assert "fraction_free" in out and np.isfinite(out["fraction_free"])


def test_plotting_functions(tmp_path):
    from mpc_via_diffusion_model_tpu.envs import ENV_SIMPLE_2D
    from mpc_via_diffusion_model_tpu.eval.plotting import (
        plot_closed_loop_comparison, plot_mean_ci, plot_planning_env, save_fig,
    )
    import matplotlib.pyplot as plt

    x = np.random.RandomState(0).randn(21, 5).cumsum(0)
    u = np.random.RandomState(1).randn(20, 1)
    fig = plot_closed_loop_comparison([x, x * 0.9], [u, u * 0.9], ["a", "b"])
    save_fig(fig, str(tmp_path / "cmp"))
    assert os.path.exists(str(tmp_path / "cmp.png"))
    plt.close(fig)

    trajs = np.random.RandomState(2).uniform(-1, 1, (5, 16, 2))
    fig = plot_planning_env(ENV_SIMPLE_2D, trajs, best_idx=0)
    save_fig(fig, str(tmp_path / "env"))
    assert os.path.exists(str(tmp_path / "env.pdf"))
    plt.close(fig)

    fig, ax = plt.subplots()
    plot_mean_ci(ax, np.arange(10), np.random.RandomState(3).randn(6, 10))
    plt.close(fig)


def test_data_tools():
    x5 = np.array([[1.0, 2.0, 3.0, 4.0, 5.0]], dtype=np.float32)
    x4 = convert_condition_5_to_4(x5)
    np.testing.assert_allclose(x4, [[1.0, 2.0, 5.0, 4.0]])

    u = np.random.RandomState(0).randn(10, 8, 1).astype(np.float32)
    x0 = np.random.RandomState(1).randn(10, 5).astype(np.float32)
    rep = check_dataset(u, x0, j=np.ones(10))
    assert rep["ok"] and rep["horizon"] == 8 and rep["j_mean"] == 1.0
    u_bad = u.copy()
    u_bad[0, 0, 0] = np.nan
    assert not check_dataset(u_bad, x0)["ok"]


def test_timing_harness():
    f = jax.jit(lambda x: x * 2)
    stats = time_fn(f, jnp.ones(16), n_warmup=1, n_repeat=3)
    assert stats["median_s"] > 0 and stats["n"] == 3
    with Timer() as t:
        pass
    assert t.elapsed >= 0
    # the one shared pipelined best-of-batches protocol (used by
    # bench_kernels / bench_highdim / bench_quadrotor_student / distill_panda)
    from mpc_via_diffusion_model_tpu.eval.timing import pipelined_time_fn
    dt = pipelined_time_fn(f, [(jnp.ones(16),)] * 4, n_batches=2)
    assert 0 < dt < 10.0


def test_ddim_closed_loop():
    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
    from mpc_via_diffusion_model_tpu.dynamics import double_integrator, double_integrator_cost
    from mpc_via_diffusion_model_tpu.models import TemporalUnet

    model = TemporalUnet(state_dim=1, n_support_points=8, unet_input_dim=8,
                         dim_mults=(1, 2), context_dim=2, conditioning_type="default")
    x = jnp.zeros((1, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 2)), jnp.zeros((1, 1)))
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 10))
    plant, cost = double_integrator(), double_integrator_cost()
    stats_u = NormalizerStats("limits", mins=jnp.full((1,), -5.0), maxs=jnp.full((1,), 5.0))
    stats_c = NormalizerStats("limits", mins=jnp.full((2,), -3.0), maxs=jnp.full((2,), 3.0))
    loop = make_closed_loop(diffusion, model.apply, stats_u, stats_c, plant, cost,
                            horizon=8, n_steps=5, sampler="ddim")
    r = jax.jit(loop)(params, jnp.array([1.0, 0.0]), jax.random.PRNGKey(1))
    assert r.u_track.shape == (5, 1)
    assert np.all(np.isfinite(np.asarray(r.x_track)))


def test_trajectory_summary_image_logging(tmp_path):
    """The reference's wandb joint-space render
    (summary_trajectory_generation.py:60-84): with an image_writer the
    summary also emits a rendered figure (PNG under log_dir/images; wandb
    when live)."""
    from mpc_via_diffusion_model_tpu.data.trajectories import TrajectoryDataset
    from mpc_via_diffusion_model_tpu.envs import ENV_SIMPLE_2D
    from mpc_via_diffusion_model_tpu.eval import make_trajectory_summary
    from mpc_via_diffusion_model_tpu.models import TemporalUnet

    rng = np.random.RandomState(0)
    trajs = rng.uniform(-0.9, 0.9, (12, 16, 2)).astype(np.float32)
    ds = TrajectoryDataset.from_arrays(trajs, env=ENV_SIMPLE_2D)
    model = TemporalUnet(state_dim=2, n_support_points=16, unet_input_dim=8,
                         dim_mults=(1, 2), conditioning_type=None)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 2)),
                        jnp.zeros((1,), jnp.int32))
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 4))
    with MetricsWriter(log_dir=str(tmp_path)) as w:
        summary = make_trajectory_summary(
            diffusion, model.apply, ds, n_samples=4,
            n_diffusion_steps_without_noise=1, image_writer=w)
        out = summary(params, jax.random.PRNGKey(1), step=123)
    assert "fraction_free" in out
    imgs = os.listdir(os.path.join(str(tmp_path), "images"))
    # the image carries the TRAINING step (wandb needs one monotonic step
    # axis shared with the scalar metrics), not a local call counter
    assert len(imgs) == 1 and imgs[0].endswith("step0000123.png")
