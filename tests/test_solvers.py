"""Solver correctness: iLQR vs the closed-form LQR optimum, swing-up basins."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.dynamics import (
    Plant,
    QuadraticCost,
    cartpole_lmpc,
    cartpole_lmpc_cost,
    cartpole_virtual_swingup,
    cartpole_virtual_cost,
    rollout_with_cost,
    theta_to_red_theta,
)
from mpc_via_diffusion_model_tpu.solvers import (
    ILQRConfig,
    ilqr_solve,
    ilqr_solve_batched,
    lqr_solve,
    lqr_solve_batched,
)


def _lmpc_matrices():
    plant = cartpole_lmpc()
    cost = cartpole_lmpc_cost()
    # recover A_d, B_d from the plant step (linear)
    n = plant.state_dim
    a = np.stack([np.asarray(plant.step(jnp.eye(n)[i], jnp.zeros(1))) for i in range(n)], axis=1)
    b = np.asarray(plant.step(jnp.zeros(n), jnp.ones(1)))[:, None]
    q = np.diag(np.asarray(cost.q_diag))
    r = np.array([[float(cost.r)]])
    p = np.diag(np.asarray(cost.p_diag))
    return plant, cost, jnp.asarray(a), jnp.asarray(b), jnp.asarray(q), jnp.asarray(r), jnp.asarray(p)


def test_lqr_optimality_first_order():
    """Perturbing the LQR solution must not decrease the cost."""
    plant, cost, a, b, q, r, p = _lmpc_matrices()
    x0 = jnp.array([0.5, 0.0, 0.3, 0.0])
    sol = lqr_solve(a, b, q, r, p, x0, horizon=8)
    assert sol.us.shape == (8, 1)
    rng = np.random.RandomState(0)
    for _ in range(5):
        du = jnp.asarray(rng.randn(8, 1) * 1e-3, jnp.float32)
        _, j_pert = rollout_with_cost(plant, cost, x0, sol.us + du)
        # rollout_with_cost stage includes x0'Qx0 (constant offset); compare costs consistently
        _, j_opt = rollout_with_cost(plant, cost, x0, sol.us)
        assert float(j_pert) >= float(j_opt) - 1e-4


def test_lqr_batched():
    _, _, a, b, q, r, p = _lmpc_matrices()
    x0s = jnp.asarray(np.random.RandomState(1).randn(16, 4), jnp.float32)
    sol = lqr_solve_batched(a, b, q, r, p, x0s, horizon=8)
    assert sol.us.shape == (16, 8, 1)
    assert np.all(np.isfinite(np.asarray(sol.cost)))


def test_ilqr_matches_lqr_on_linear_plant():
    """On the linear cart-pole the iLQR must recover the Riccati optimum."""
    plant, cost, a, b, q, r, p = _lmpc_matrices()
    x0 = jnp.array([0.4, 0.0, 0.2, 0.0])
    lqr = lqr_solve(a, b, q, r, p, x0, horizon=8)
    cfg = ILQRConfig(horizon=8, n_iterations=30)
    ilqr = ilqr_solve(plant, cost, x0, jnp.zeros((8, 1)), cfg)
    np.testing.assert_allclose(np.asarray(ilqr.us), np.asarray(lqr.us), rtol=2e-3, atol=2e-3)
    # costs agree up to the constant x0'Qx0 offset convention
    _, j_lqr = rollout_with_cost(plant, cost, x0, lqr.us)
    _, j_ilqr = rollout_with_cost(plant, cost, x0, ilqr.us)
    assert float(j_ilqr) == pytest.approx(float(j_lqr), rel=1e-4)


def test_ilqr_pendulum_swingup():
    """Full swing-up on the pendulum (horizon long enough to matter):
    16k -> ~1.4k cost, terminal state at the upright equilibrium."""
    from mpc_via_diffusion_model_tpu.dynamics import pendulum, pendulum_cost

    plant = pendulum(dt=0.02)
    cost = pendulum_cost()
    x0 = jnp.array([np.pi, 0.0])  # hanging; theta = 0 is upright
    H = 150
    u0 = jnp.full((H, 1), 0.5)
    _, j_init = rollout_with_cost(plant, cost, x0, u0)
    sol = ilqr_solve(plant, cost, x0, u0, ILQRConfig(horizon=H, n_iterations=100))
    assert float(sol.cost) < float(j_init) * 0.2
    assert abs(float(sol.xs[-1, 0])) < 1e-2  # upright
    assert abs(float(sol.xs[-1, 1])) < 1e-2


def test_ilqr_cartpole_ocp_beats_random_search():
    """On the reference's 5-state virtual cart-pole OCP (horizon 64, theta0
    = 3.0) the true optimum barely moves (validated here against random
    search and offline against CEM: cost ~637.5k); iLQR must at least
    improve on the zero-control cost and beat sampling."""
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    theta0 = 3.0
    x0 = jnp.array([0.0, 0.0, theta0, 0.0, float(theta_to_red_theta(theta0))])
    u0 = jnp.zeros((64, 1))
    _, j_init = rollout_with_cost(plant, cost, x0, u0)
    sol = ilqr_solve(plant, cost, x0, u0, ILQRConfig(horizon=64, n_iterations=30))
    assert float(sol.cost) < float(j_init)
    assert np.all(np.isfinite(np.asarray(sol.us)))

    key = jax.random.PRNGKey(0)
    u_rand = jax.random.normal(key, (512, 64, 1)) * 10.0

    def total(u):
        _, j = rollout_with_cost(plant, cost, x0, u)
        return j

    j_rand_best = float(jnp.min(jax.vmap(total)(u_rand)))
    assert float(sol.cost) <= j_rand_best


def test_ilqr_two_basins():
    """Opposite control initializations reach opposite swing-up directions
    (the multi-modality the reference probes via +/- IPOPT guesses,
    Cart_Diffusion_inference.py:49-51)."""
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    theta0 = np.pi  # perfectly hanging: symmetric
    x0 = jnp.array([0.0, 0.0, theta0, 0.0, float(theta_to_red_theta(theta0))])
    cfg = ILQRConfig(horizon=64, n_iterations=40)
    u_pos = jnp.full((64, 1), 5.0)
    u_neg = jnp.full((64, 1), -5.0)
    x0s = jnp.stack([x0, x0])
    u_inits = jnp.stack([u_pos, u_neg])
    sols = ilqr_solve_batched(plant, cost, x0s, u_inits, cfg)
    th_final = np.asarray(sols.xs)[:, -1, 2]
    # both converge near upright but on opposite sides of pi
    assert (th_final[0] - np.pi) * (th_final[1] - np.pi) < 0


def test_ilqr_batched_jits():
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    cfg = ILQRConfig(horizon=16, n_iterations=10)
    f = jax.jit(lambda x0s, uis: ilqr_solve_batched(plant, cost, x0s, uis, cfg))
    x0s = jnp.asarray(np.random.RandomState(2).uniform(-0.3, 0.3, (4, 5)), jnp.float32)
    uis = jnp.zeros((4, 16, 1))
    sol = f(x0s, uis)
    assert sol.us.shape == (4, 16, 1)
    assert np.all(np.isfinite(np.asarray(sol.cost)))


def test_ilqr_quadrotor_hover():
    """12-state quadrotor regulation (BASELINE configs[4] plant): iLQR from a
    displaced hover brings position error down."""
    from mpc_via_diffusion_model_tpu.dynamics import quadrotor, quadrotor_cost

    plant = quadrotor()
    cost = quadrotor_cost()
    x0 = jnp.zeros(12).at[0].set(1.0).at[2].set(-0.5)
    # hover thrust feedforward as initial guess (m*g for thrust channel)
    u0 = jnp.zeros((40, 4)).at[:, 0].set(9.81)
    _, j_init = rollout_with_cost(plant, cost, x0, u0)
    sol = ilqr_solve(plant, cost, x0, u0, ILQRConfig(horizon=40, n_iterations=40))
    # position recovery through the attitude chain is slow over 0.8 s; expect
    # a solid improvement and a shrinking position error, not full recovery
    assert float(sol.cost) < float(j_init) * 0.8
    assert float(jnp.linalg.norm(sol.xs[-1, :3])) < float(jnp.linalg.norm(x0[:3]))
    assert np.all(np.isfinite(np.asarray(sol.us)))


def test_pd_solve_rejects_indefinite_positive_diagonal():
    """VERDICT r1 item 6: an indefinite Quu with positive diagonal (eigs 3,
    -1 here) must be rejected; the old diag(Quu) > 0 proxy accepted it."""
    from mpc_via_diffusion_model_tpu.solvers import pd_solve

    indefinite = jnp.array([[1.0, 2.0], [2.0, 1.0]])
    rhs = jnp.ones((2, 3))
    sol, ok = pd_solve(indefinite, rhs)
    assert not bool(ok)
    assert np.all(np.asarray(sol) == 0.0)

    spd = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    sol, ok = pd_solve(spd, rhs)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(spd @ sol), np.asarray(rhs), rtol=1e-5, atol=1e-5)


def test_ilqr_reports_backward_ok():
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    x0 = jnp.array([0.0, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
    sol = ilqr_solve(plant, cost, x0, jnp.zeros((16, 1)), ILQRConfig(horizon=16, n_iterations=10))
    assert bool(sol.backward_ok)
