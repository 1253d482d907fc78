"""Control runtime: fused closed loop, candidate selection, NMPC baseline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.control import (
    count_swing_modes,
    make_closed_loop,
    make_nmpc_closed_loop,
    make_replan_fn,
    per_step_mpc_costs,
    track_parity,
)
from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.dynamics import (
    cartpole_virtual_swingup,
    cartpole_virtual_cost,
    double_integrator,
    double_integrator_cost,
    theta_to_red_theta,
)
from mpc_via_diffusion_model_tpu.models import PointUnet, TemporalUnet
from mpc_via_diffusion_model_tpu.solvers import ILQRConfig

H = 8


@pytest.fixture(scope="module")
def small_model():
    model = TemporalUnet(
        state_dim=1, n_support_points=H, unet_input_dim=8, dim_mults=(1, 2),
        context_dim=5, conditioning_type="default",
    )
    x = jnp.zeros((1, H, 1))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 5))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, jnp.zeros((1, 1)))
    return model, params


@pytest.fixture(scope="module")
def stats():
    inputs_stats = NormalizerStats("limits", mins=jnp.full((1,), -10.0), maxs=jnp.full((1,), 10.0))
    cond_stats = NormalizerStats("limits", mins=jnp.full((5,), -8.0), maxs=jnp.full((5,), 8.0))
    return inputs_stats, cond_stats


def test_replan_shapes_and_limits(small_model, stats):
    model, params = small_model
    inputs_stats, cond_stats = stats
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    replan = make_replan_fn(
        diffusion, model.apply, inputs_stats, cond_stats, horizon=H, w=0.01,
        n_diffusion_steps_without_noise=2,
    )
    x0 = jnp.array([0.1, 0.0, 3.0, 0.0, 0.5])
    u_hor, u_cand = jax.jit(replan)(params, x0, jax.random.PRNGKey(0))
    assert u_hor.shape == (H, 1)
    assert u_cand.shape == (1, H, 1)
    # unnormalize clips to the data limits
    assert float(jnp.max(jnp.abs(u_hor))) <= 10.0 + 1e-5


def test_closed_loop_runs_fused(small_model, stats):
    model, params = small_model
    inputs_stats, cond_stats = stats
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    loop = make_closed_loop(
        diffusion, model.apply, inputs_stats, cond_stats, plant, cost,
        horizon=H, n_steps=10, n_diffusion_steps_without_noise=2,
    )
    theta0 = 3.0
    x0 = jnp.array([0.0, 0.0, theta0, 0.0, float(theta_to_red_theta(theta0))])
    result = jax.jit(loop)(params, x0, jax.random.PRNGKey(1))
    assert result.x_track.shape == (11, 5)
    assert result.u_track.shape == (10, 1)
    assert result.u_horizons.shape == (10, H, 1)
    assert result.stage_costs.shape == (10,)
    assert np.all(np.isfinite(np.asarray(result.x_track)))

    # deterministic given key
    result2 = jax.jit(loop)(params, x0, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(result.u_track), np.asarray(result2.u_track))


def test_candidate_selection_reduces_cost(small_model, stats):
    """n_candidates > 1 with min-cost selection must not do worse (in
    per-replan horizon cost) than candidate 0 on average."""
    model, params = small_model
    inputs_stats, cond_stats = stats
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    replan_multi = make_replan_fn(
        diffusion, model.apply, inputs_stats, cond_stats, horizon=H, w=0.01,
        n_diffusion_steps_without_noise=2, n_candidates=8, plant=plant, cost=cost,
    )
    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])

    def horizon_cost(u_seq):
        def body(carry, u):
            x, acc = carry
            acc = acc + cost.stage(x, u)
            return (plant.step(x, u), acc), None

        (x_f, acc), _ = jax.lax.scan(body, (x0, jnp.float32(0.0)), u_seq)
        return acc + cost.terminal(x_f)

    u_best, u_cand = jax.jit(replan_multi)(params, x0, jax.random.PRNGKey(3))
    assert u_cand.shape == (8, H, 1)
    j_best = float(horizon_cost(u_best))
    j_all = [float(horizon_cost(u_cand[i])) for i in range(8)]
    assert j_best == pytest.approx(min(j_all), rel=1e-5)


def test_selection_horizon_scores_the_credible_prefix(small_model):
    """`selection_horizon` must rank candidates by TRUNCATED rollout cost:
    a plan with cheap first actions but an expensive tail should win under
    a short selection horizon and lose under full-horizon scoring. This is
    the panda best-of-K fix — its sampled plan tails run ~9x the expert's
    open-loop cost (flagship_panda_rbd horizon_diagnosis), so full-horizon
    argmin ranks by tail noise while only u[0] is ever applied."""
    model, _ = small_model
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    plant = double_integrator()
    cost = double_integrator_cost()
    in_stats = NormalizerStats(
        "limits", mins=jnp.full((1,), -10.0), maxs=jnp.full((1,), 10.0))
    c_stats = NormalizerStats(
        "limits", mins=jnp.full((2,), -8.0), maxs=jnp.full((2,), 8.0))

    # candidate 0: zero controls for 4 steps, then saturated tail
    # candidate 1: wrong-direction moderate controls early, zero tail
    u_a = jnp.concatenate([jnp.zeros((4, 1)), jnp.full((H - 4, 1), 9.5)])
    u_b = jnp.concatenate([jnp.full((4, 1), 5.0), jnp.zeros((H - 4, 1))])
    cand_norm = jnp.stack([u_a, u_b]) / 10.0  # limits-normalized

    def mk(sel_h):
        return jax.jit(make_replan_fn(
            diffusion, model.apply, in_stats, c_stats, horizon=H,
            n_candidates=2, plant=plant, cost=cost,
            sample_override=lambda ctx, key: cand_norm,
            selection_horizon=sel_h))

    x0 = jnp.array([2.0, 0.0])
    key = jax.random.PRNGKey(0)
    u_full, _ = mk(None)(None, x0, key)
    u_trunc, _ = mk(4)(None, x0, key)
    # full-horizon scoring is dominated by candidate 0's saturated tail
    np.testing.assert_allclose(np.asarray(u_full), np.asarray(u_b), atol=1e-5)
    # truncated scoring sees only the prefix: candidate 0's zero controls win
    np.testing.assert_allclose(np.asarray(u_trunc), np.asarray(u_a), atol=1e-5)


def test_nmpc_closed_loop_stabilizes_double_integrator():
    plant = double_integrator()
    cost = double_integrator_cost()
    loop = make_nmpc_closed_loop(
        plant, cost, ILQRConfig(horizon=16, n_iterations=15), n_steps=50,
    )
    x0 = jnp.array([2.0, 0.0])
    result = jax.jit(loop)(x0)
    # drives position from 2.0 to near zero (50 steps x 0.05 s, soft weights
    # -> small overshoot and slow settle; |x| ends ~0.11)
    assert abs(float(result.x_track[-1, 0])) < 0.15
    assert abs(float(result.x_track[-1, 1])) < 0.5
    assert np.all(np.isfinite(np.asarray(result.u_track)))


def test_metrics(small_model, stats):
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    loop = make_nmpc_closed_loop(plant, cost, ILQRConfig(horizon=H, n_iterations=5), n_steps=5)
    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
    r1 = jax.jit(loop)(x0)
    parity = track_parity(r1, r1)
    assert parity["u_l1"] == 0.0
    costs = per_step_mpc_costs(plant, cost, r1)
    assert costs.shape == (5,)
    assert np.all(np.isfinite(np.asarray(costs)))

    tracks = np.stack([np.asarray(r1.x_track), np.asarray(r1.x_track)])
    modes = count_swing_modes(tracks)
    assert modes["left"] + modes["right"] == 2


def test_ampc_closed_loop():
    """MLP-baseline closed loop (reference NMPC_NN_Inference harness)."""
    from mpc_via_diffusion_model_tpu.control import make_ampc_closed_loop
    from mpc_via_diffusion_model_tpu.models import AMPCNet

    plant = double_integrator()
    cost = double_integrator_cost()
    model = AMPCNet(horizon=8, control_dim=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    inputs_stats = NormalizerStats("limits", mins=jnp.full((1,), -5.0), maxs=jnp.full((1,), 5.0))
    cond_stats = NormalizerStats("limits", mins=jnp.full((2,), -3.0), maxs=jnp.full((2,), 3.0))
    loop = make_ampc_closed_loop(model.apply, inputs_stats, cond_stats, plant, cost, n_steps=10)
    r = jax.jit(loop)(params, jnp.array([1.0, 0.0]))
    assert r.u_track.shape == (10, 1)
    assert r.u_horizons.shape == (10, 8, 1)
    assert np.all(np.isfinite(np.asarray(r.x_track)))


def test_panda_config_replan():
    """The reference's Panda workload shape: 20-dim context, 7 control
    channels, horizon 128 (inference_diffusion_panda.py:28-31,377-399)."""
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, panda_context

    plant, cost = get_plant("panda_surrogate")
    model = TemporalUnet(
        state_dim=7, n_support_points=128, unet_input_dim=8, dim_mults=(1, 2),
        context_dim=20, conditioning_type="default",
    )
    x = jnp.zeros((1, 128, 7))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 20)), jnp.zeros((1, 1)))
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    inputs_stats = NormalizerStats("limits", mins=jnp.full((7,), -50.0), maxs=jnp.full((7,), 50.0))
    cond_stats = NormalizerStats("limits", mins=jnp.full((20,), -5.0), maxs=jnp.full((20,), 5.0))
    loop = make_closed_loop(
        diffusion, model.apply, inputs_stats, cond_stats, plant, cost,
        horizon=128, n_steps=3, n_diffusion_steps_without_noise=1,
        state_to_condition=panda_context,
    )
    x0 = jnp.concatenate([jnp.full((7,), 0.3), jnp.zeros(7)])
    r = jax.jit(loop)(params, x0, jax.random.PRNGKey(1))
    assert r.u_track.shape == (3, 7)
    assert r.u_horizons.shape == (3, 128, 7)
    assert np.all(np.isfinite(np.asarray(r.x_track)))


def test_candidate_selection_with_state_to_condition():
    """Regression: with n_candidates > 1 and a non-identity
    state_to_condition, the rollout must be seeded with the PLANT state (the
    condition has different dims)."""
    from mpc_via_diffusion_model_tpu.dynamics import get_plant, panda_context

    plant, cost = get_plant("panda_surrogate")
    model = TemporalUnet(
        state_dim=7, n_support_points=8, unet_input_dim=8, dim_mults=(1, 2),
        context_dim=20, conditioning_type="default",
    )
    x = jnp.zeros((1, 8, 7))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 20)), jnp.zeros((1, 1)))
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 4))
    inputs_stats = NormalizerStats("limits", mins=jnp.full((7,), -50.0), maxs=jnp.full((7,), 50.0))
    cond_stats = NormalizerStats("limits", mins=jnp.full((20,), -5.0), maxs=jnp.full((20,), 5.0))
    loop = make_closed_loop(
        diffusion, model.apply, inputs_stats, cond_stats, plant, cost,
        horizon=8, n_steps=2, n_diffusion_steps_without_noise=1,
        n_candidates=4, state_to_condition=panda_context,
    )
    x0 = jnp.concatenate([jnp.full((7,), 0.2), jnp.zeros(7)])
    r = jax.jit(loop)(params, x0, jax.random.PRNGKey(1))
    assert r.u_track.shape == (2, 7)
    assert np.all(np.isfinite(np.asarray(r.x_track)))
