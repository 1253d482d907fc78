"""Plant dynamics vs closed-form / numpy oracles (fp32 tolerance)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.dynamics import (
    acrobot,
    cartpole_lmpc,
    cartpole_lmpc_cost,
    cartpole_virtual_stabilized,
    cartpole_virtual_swingup,
    cartpole_virtual_cost,
    double_integrator,
    get_plant,
    pendulum,
    quadrotor,
    reference_mpc_cost,
    rollout,
    rollout_with_cost,
    theta_to_red_theta,
)


def _oracle_swingup_step(x, u, dt=0.01):
    """Verbatim numpy port of EulerForwardCartpole_virtual
    (nmpc_multi_process_collect_data.py:121-137)."""
    M_CART, M_POLE = 2.0, 1.0
    M_TOTAL, L_POLE = 3.0, 1.0
    MPLP = M_POLE * L_POLE
    G = 9.81
    MPG, MTG, MTLP = M_POLE * G, M_TOTAL * G, M_TOTAL * G
    xdot = np.array(
        [
            x[1],
            (MPLP * -np.sin(x[2]) * x[3] ** 2 + MPG * np.sin(x[2]) * np.cos(x[2]) + u)
            / (M_TOTAL - M_POLE * np.cos(x[2])) ** 2,
            x[3],
            (-MPLP * np.sin(x[2]) * np.cos(x[2]) * x[3] ** 2 - MTG * np.sin(x[2]) - np.cos(x[2]) * u)
            / (MTLP - MPLP * np.cos(x[2]) ** 2),
            -(2 / np.pi) * (x[2] - np.pi) * x[3],
        ]
    )
    return x + xdot * dt


def test_swingup_matches_reference_oracle():
    plant = cartpole_virtual_swingup()
    x = np.array([0.3, -0.2, 2.5, 0.4, float(theta_to_red_theta(2.5))], dtype=np.float32)
    u = np.float32(1.7)
    got = plant.step(jnp.asarray(x), jnp.asarray([u]))
    want = _oracle_swingup_step(x.astype(np.float64), float(u))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_theta_to_red_theta():
    # theta = pi maps to pi; theta = 0 and 2*pi both map to ~0
    assert float(theta_to_red_theta(np.pi)) == pytest.approx(np.pi)
    assert float(theta_to_red_theta(0.0)) == pytest.approx(0.0, abs=1e-6)
    assert float(theta_to_red_theta(2 * np.pi)) == pytest.approx(0.0, abs=1e-6)


def test_lmpc_zoh_matches_series_expm():
    """ZoH discretization vs high-resolution Euler integration of the ODE."""
    plant = cartpole_lmpc(dt=0.1)
    A = np.array([[0, 1, 0, 0], [0, -0.1, 3, 0], [0, 0, 0, 1], [0, -0.5, 30, 0]])
    B = np.array([[0.0], [2.0], [0.0], [5.0]])
    x = np.array([0.5, 0.1, 0.2, -0.3])
    u = 0.7
    # integrate xdot = Ax + Bu with tiny Euler steps (ZoH holds u constant)
    xs = x.copy()
    n_sub = 200000
    h = 0.1 / n_sub
    for _ in range(n_sub):
        xs = xs + (A @ xs + B[:, 0] * u) * h
    got = plant.step(jnp.asarray(x, dtype=jnp.float32), jnp.asarray([u], dtype=jnp.float32))
    np.testing.assert_allclose(got, xs, rtol=1e-4, atol=1e-5)


def test_rollout_shapes_and_consistency():
    plant = cartpole_virtual_stabilized()
    cost = cartpole_virtual_cost()
    x0 = jnp.array([0.1, 0.0, 3.0, 0.0, float(theta_to_red_theta(3.0))])
    u_seq = jnp.ones((16, 1)) * 0.5
    xs = rollout(plant, x0, u_seq)
    assert xs.shape == (17, 5)
    xs2, total = rollout_with_cost(plant, cost, x0, u_seq)
    np.testing.assert_allclose(xs, xs2, rtol=1e-6)
    # manual cost
    want = sum(float(cost.stage(xs[i], u_seq[i])) for i in range(16)) + float(cost.terminal(xs[16]))
    assert float(total) == pytest.approx(want, rel=1e-5)


def test_reference_mpc_cost_matches_verbatim_loop():
    """reference_mpc_cost vs a literal numpy port of calMPCCost
    (Cart_Diffusion_inference.py:247-283)."""
    plant = cartpole_virtual_swingup()
    cost = cartpole_virtual_cost()
    rng = np.random.RandomState(0)
    x0 = np.array([0.2, 0.0, 3.0, 0.1, float(theta_to_red_theta(3.0))], dtype=np.float64)
    H = 8
    u_hor = rng.uniform(-2, 2, size=(1, H, 1))

    Q = np.diag([0.01, 0.01, 0, 0.001, 1000.0])
    R = 0.1
    P = np.diag([0.01, 0.01, 0, 0.001, 1000.0])

    # verbatim port
    c = 0.0
    for i in range(5):
        c += Q[i][i] * x0[i] ** 2
    for i in range(1):  # num_u = u_hor.shape[0] = 1
        c += R * u_hor[i][0][0] ** 2
    x_cur, u_cur = x0, u_hor[0][0][0]
    for i in range(1, H - 1):
        xnext = _oracle_swingup_step(x_cur, u_cur)
        unext = u_hor[0, i, 0]
        for j in range(1, 5):
            c += Q[j][j] * xnext[j] ** 2
        c += R * unext ** 2
        u_cur, x_cur = unext, xnext
    for i in range(5):
        c += P[i][i] * xnext[i] ** 2

    got = reference_mpc_cost(plant, cost, jnp.asarray(x0, jnp.float32), jnp.asarray(u_hor[0], jnp.float32))
    assert float(got) == pytest.approx(c, rel=1e-4)


@pytest.mark.parametrize(
    "name", ["cartpole_lmpc", "cartpole_virtual_swingup", "cartpole_virtual_stabilized",
             "pendulum", "double_integrator", "acrobot", "quadrotor"],
)
def test_registry_and_vmap(name):
    plant, cost = get_plant(name)
    batch = 7
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (batch, plant.state_dim)) * 0.1
    us = jax.random.normal(key, (batch, plant.control_dim)) * 0.1
    out = jax.vmap(plant.step)(xs, us)
    assert out.shape == (batch, plant.state_dim)
    assert np.all(np.isfinite(out))
    c = cost.stage(xs[0], us[0])
    assert np.isfinite(float(c))


def test_dynamics_differentiable():
    plant, cost = get_plant("cartpole_virtual_swingup")
    x0 = jnp.array([0.1, 0.0, 3.0, 0.0, 0.5])

    def total_cost(u_seq):
        _, c = rollout_with_cost(plant, cost, x0, u_seq)
        return c

    g = jax.grad(total_cost)(jnp.zeros((8, 1)))
    assert g.shape == (8, 1)
    assert np.all(np.isfinite(g))
    assert np.any(np.abs(g) > 0)
