"""MPPI sampling solver."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_via_diffusion_model_tpu.dynamics import (
    double_integrator,
    double_integrator_cost,
    pendulum,
    pendulum_cost,
    rollout_with_cost,
)
from mpc_via_diffusion_model_tpu.solvers.mppi import MPPIConfig, mppi_solve, mppi_solve_batched


def test_mppi_improves_on_double_integrator():
    plant = double_integrator()
    cost = double_integrator_cost()
    x0 = jnp.array([2.0, 0.0])
    u0 = jnp.zeros((16, 1))
    _, j_init = rollout_with_cost(plant, cost, x0, u0)
    cfg = MPPIConfig(horizon=16, n_samples=512, n_iterations=10, noise_sigma=3.0)
    us, j = mppi_solve(plant, cost, x0, u0, cfg, jax.random.PRNGKey(0))
    assert us.shape == (16, 1)
    assert float(j) < float(j_init) * 0.7
    assert np.all(np.isfinite(np.asarray(us)))


def test_mppi_pendulum_swingup_progress():
    """MPPI should find energy-pumping solutions on the pendulum."""
    plant = pendulum(dt=0.02)
    cost = pendulum_cost()
    x0 = jnp.array([np.pi, 0.0])
    u0 = jnp.zeros((100, 1))
    _, j_init = rollout_with_cost(plant, cost, x0, u0)
    cfg = MPPIConfig(horizon=100, n_samples=1024, n_iterations=15, noise_sigma=4.0,
                     temperature=2.0)
    us, j = mppi_solve(plant, cost, x0, u0, cfg, jax.random.PRNGKey(1))
    assert float(j) < float(j_init)


def test_mppi_survives_all_diverged_rollouts():
    """Every perturbed rollout diverging to non-finite cost must NOT poison
    the update: the finite-ceiling mask degrades to uniform weights instead
    of inf - inf = nan (the quadrotor flagship failure mode)."""
    from mpc_via_diffusion_model_tpu.dynamics.base import Plant, QuadraticCost

    explode = Plant(name="explode", state_dim=1, control_dim=1, dt=0.1,
                    step=lambda x, u: x * x + u)  # x_{t+1} = x_t^2 -> inf fast
    cost = QuadraticCost(q_diag=jnp.ones(1), r=jnp.ones(1), p_diag=jnp.ones(1))
    x0 = jnp.array([4.0])
    u0 = jnp.zeros((20, 1))
    cfg = MPPIConfig(horizon=20, n_samples=64, n_iterations=5, noise_sigma=1.0)
    us, _ = mppi_solve(explode, cost, x0, u0, cfg, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(us)))


def test_mppi_per_channel_noise_sigma():
    """Tuple noise_sigma scales exploration per control channel; a channel
    with sigma=0 must come back unchanged."""
    plant = double_integrator()
    cost = double_integrator_cost()
    # fake a 2-channel plant: second channel unused by dynamics
    from mpc_via_diffusion_model_tpu.dynamics.base import Plant
    plant2 = Plant(name="di2", state_dim=2, control_dim=2, dt=plant.dt,
                   step=lambda x, u: plant.step(x, u[:1]))
    cfg = MPPIConfig(horizon=8, n_samples=256, n_iterations=3,
                     noise_sigma=(3.0, 0.0))
    u0 = jnp.zeros((8, 2))
    us, _ = mppi_solve(plant2, cost, jnp.array([2.0, 0.0]), u0, cfg,
                       jax.random.PRNGKey(2))
    assert np.all(np.asarray(us)[:, 1] == 0.0)
    assert np.any(np.asarray(us)[:, 0] != 0.0)


def test_mppi_batched_jits():
    plant = double_integrator()
    cost = double_integrator_cost()
    cfg = MPPIConfig(horizon=8, n_samples=128, n_iterations=4)
    f = jax.jit(lambda x0s, uis, k: mppi_solve_batched(plant, cost, x0s, uis, cfg, k))
    x0s = jnp.asarray([[1.0, 0.0], [-1.0, 0.2]])
    us, js = f(x0s, jnp.zeros((2, 8, 1)), jax.random.PRNGKey(0))
    assert us.shape == (2, 8, 1)
    assert np.all(np.isfinite(np.asarray(js)))
