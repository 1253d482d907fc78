"""End-to-end slice (SURVEY.md §4d): expert data -> train -> closed loop.

Double-integrator workload (convex, fast): generate an LQR expert dataset
over an initial-state grid, train a small conditional temporal U-Net to
imitate the expert's u-horizons with CFG dropout, then run the fused
diffusion-MPC closed loop and check it steers the plant toward the origin
with closed-loop cost within a factor of the expert's.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.control import make_closed_loop, make_nmpc_closed_loop, track_parity
from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.data.generation import collect_lmpc_dataset
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.dynamics import double_integrator, double_integrator_cost
from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.solvers import ILQRConfig
from mpc_via_diffusion_model_tpu.train import Trainer

H = 8
N_STEPS = 20


@pytest.fixture(scope="module")
def e2e():
    plant = double_integrator()
    cost = double_integrator_cost()
    n = 2
    a = jnp.asarray(
        np.stack([np.asarray(plant.step(jnp.eye(n)[i], jnp.zeros(1))) for i in range(n)], axis=1)
    )
    b = jnp.asarray(np.asarray(plant.step(jnp.zeros(n), jnp.ones(1)))[:, None])
    q = jnp.diag(cost.q_diag)
    r = jnp.array([[float(cost.r)]])
    p = jnp.diag(cost.p_diag)

    # dense-ish grid + noisy replicas: ~500 samples
    pos = np.linspace(-2, 2, 9)
    vel = np.linspace(-1, 1, 7)
    grid = np.array([[pp, vv] for pp in pos for vv in vel], dtype=np.float32)
    ds = collect_lmpc_dataset(
        a, b, q, r, p, grid, horizon=H, noise_std=0.1, n_noisy=3,
        key=jax.random.PRNGKey(0),
    )

    model = TemporalUnet(
        state_dim=1, n_support_points=H, unet_input_dim=16, dim_mults=(1, 2),
        context_dim=2, conditioning_type="default",
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 15))
    x = jnp.zeros((2, H, 1))
    params = model.init(
        jax.random.PRNGKey(1), x, jnp.zeros((2,), jnp.int32), jnp.zeros((2, 2)), jnp.zeros((2, 1))
    )
    trainer = Trainer(diffusion, model.apply, params, lr=2e-3,
                      step_start_ema=100, update_ema_every=5)
    trainer.fit(ds, num_train_steps=800, batch_size=128,
                steps_til_summary=400, log_fn=lambda s: None)
    return plant, cost, ds, model, diffusion, trainer


def test_training_converged(e2e):
    plant, cost, ds, model, diffusion, trainer = e2e
    losses = [l for _, l in trainer.train_losses]
    assert losses[-1] < losses[0] * 0.5
    assert losses[-1] < 0.25


def test_closed_loop_cost_near_expert(e2e):
    plant, cost, ds, model, diffusion, trainer = e2e
    loop = make_closed_loop(
        diffusion, model.apply,
        ds.normalizer.stats["inputs"], ds.normalizer.stats["condition"],
        plant, cost, horizon=H, n_steps=N_STEPS, w=0.01,
        n_diffusion_steps_without_noise=3,
    )
    x0 = jnp.array([1.5, 0.0])
    result = jax.jit(loop)(trainer.state.ema_params, x0, jax.random.PRNGKey(7))

    expert_loop = make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=H, n_iterations=10), n_steps=N_STEPS
    )
    expert = jax.jit(expert_loop)(x0)

    j_diff = float(jnp.sum(result.stage_costs))
    j_exp = float(jnp.sum(expert.stage_costs))
    # imitation should land within 3x of the expert's closed-loop cost and
    # actually move the state toward the origin
    assert abs(float(result.x_track[-1, 0])) < abs(float(x0[0])) * 0.7
    assert j_diff < 3.0 * j_exp

    parity = track_parity(result, expert)
    assert np.isfinite(parity["u_l1"])


def test_closed_loop_batched_over_initial_states(e2e):
    """vmap the whole closed loop over a batch of initial states."""
    plant, cost, ds, model, diffusion, trainer = e2e
    loop = make_closed_loop(
        diffusion, model.apply,
        ds.normalizer.stats["inputs"], ds.normalizer.stats["condition"],
        plant, cost, horizon=H, n_steps=10, n_diffusion_steps_without_noise=2,
    )
    x0s = jnp.asarray([[1.0, 0.0], [-1.0, 0.3], [0.5, -0.5]])
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    batched = jax.jit(jax.vmap(lambda x0, k: loop(trainer.state.ema_params, x0, k)))
    results = batched(x0s, keys)
    assert results.x_track.shape == (3, 11, 2)
    assert np.all(np.isfinite(np.asarray(results.x_track)))
