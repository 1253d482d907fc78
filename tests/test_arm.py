"""Panda-surrogate arm: FK sanity, context shape, closed-loop regulation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.dynamics import (
    get_plant,
    panda_context,
    panda_ee_velocity,
    panda_fk,
)
from mpc_via_diffusion_model_tpu.control import make_nmpc_closed_loop
from mpc_via_diffusion_model_tpu.solvers import ILQRConfig


def test_fk_home_pose_matches_published():
    """At q=0 the Panda flange is at (0.088, 0, 0.926) m in the base frame —
    the published zero-configuration pose of the real robot."""
    p = np.asarray(panda_fk(jnp.zeros(7)))
    np.testing.assert_allclose(p, [0.088, 0.0, 0.926], atol=1e-3)


def test_fk_reach_envelope():
    """All reachable points stay within the ~0.855 m Panda reach + flange."""
    qs = jax.random.uniform(jax.random.PRNGKey(0), (64, 7), minval=-2.8, maxval=2.8)
    pts = jax.vmap(panda_fk)(qs)
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    assert np.all(r < 1.3)
    assert np.all(np.isfinite(np.asarray(pts)))


def test_ee_velocity_matches_finite_difference():
    q = jnp.array([0.3, -0.5, 0.2, -1.2, 0.1, 1.5, 0.4])
    qd = jnp.array([0.1, -0.2, 0.3, 0.0, -0.1, 0.2, 0.05])
    v = panda_ee_velocity(q, qd)
    eps = 1e-4
    v_fd = (panda_fk(q + eps * qd) - panda_fk(q - eps * qd)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_fd), rtol=1e-2, atol=1e-4)


def test_context_is_20_dim():
    x = jax.random.normal(jax.random.PRNGKey(1), (14,)) * 0.3
    c = panda_context(x)
    assert c.shape == (20,)
    np.testing.assert_allclose(np.asarray(c[:14]), np.asarray(x), rtol=1e-6)


def test_nmpc_regulates_arm():
    plant, cost = get_plant("panda_surrogate")
    loop = make_nmpc_closed_loop(plant, cost, ILQRConfig(horizon=16, n_iterations=10), n_steps=200)
    x0 = jnp.concatenate([jnp.full((7,), 0.5), jnp.zeros(7)])
    r = jax.jit(loop)(x0)
    q = np.asarray(r.x_track)[:, :7]
    # soft R makes regulation gentle; 2 s drives the posture most of the way
    assert np.all(np.abs(q[-1]) < 0.2)
    assert np.all(np.abs(q[-1]) < np.abs(q[0]))
    assert np.all(np.isfinite(np.asarray(r.u_track)))


# --------------------------------------------------------------------------- #
# Articulated rigid-body Panda (round 2): physics-correctness tests
# --------------------------------------------------------------------------- #

def _rand_q(seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-scale, scale, 7), jnp.float32)


def test_panda_rbd_gravity_matches_potential_gradient():
    """RNE gravity torque must equal dV/dq with V = sum_i m_i g z_com_i
    computed INDEPENDENTLY from the FK chain via autodiff."""
    from mpc_via_diffusion_model_tpu.dynamics import (
        panda_inverse_dynamics, panda_link_transforms,
    )
    from mpc_via_diffusion_model_tpu.dynamics.arm import _PANDA_MASS, _PANDA_COM

    def potential(q):
        v = 0.0
        for i, (r, p) in enumerate(panda_link_transforms(q)):
            com_world = p + r @ jnp.asarray(_PANDA_COM[i], jnp.float32)
            v = v + _PANDA_MASS[i] * 9.81 * com_world[2]
        return v

    for seed in (0, 1, 2):
        q = _rand_q(seed, 1.5)
        tau_g = panda_inverse_dynamics(q, jnp.zeros(7), jnp.zeros(7))
        tau_v = jax.grad(potential)(q)
        np.testing.assert_allclose(np.asarray(tau_g), np.asarray(tau_v), rtol=2e-3, atol=2e-3)


def test_panda_rbd_mass_matrix_spd_and_kinetic_energy():
    """M(q) symmetric positive definite; 0.5 qd' M qd equals the kinetic
    energy computed independently from link spatial velocities via FK
    autodiff (jvp of each link pose along qd)."""
    from mpc_via_diffusion_model_tpu.dynamics import (
        panda_link_transforms, panda_mass_matrix,
    )
    from mpc_via_diffusion_model_tpu.dynamics.arm import (
        _PANDA_COM, _PANDA_INERTIA, _PANDA_MASS,
    )

    q = _rand_q(3, 1.2)
    rng = np.random.RandomState(4)
    qd = jnp.asarray(rng.randn(7), jnp.float32)

    m = panda_mass_matrix(q)
    eigs = np.linalg.eigvalsh(np.asarray(m))
    assert eigs.min() > 0, eigs

    ke_m = float(0.5 * qd @ m @ qd)

    def com_and_rot(qq):
        out = []
        for i, (r, p) in enumerate(panda_link_transforms(qq)):
            out.append((p + r @ jnp.asarray(_PANDA_COM[i], jnp.float32), r))
        return out

    poses, vels = jax.jvp(com_and_rot, (q,), (qd,))
    ke_fk = 0.0
    for i in range(7):
        com_dot = np.asarray(vels[i][0])
        r = np.asarray(poses[i][1])
        r_dot = np.asarray(vels[i][1])
        omega_skew = r.T @ r_dot  # body-frame angular velocity (skew)
        omega = np.array([omega_skew[2, 1], omega_skew[0, 2], omega_skew[1, 0]])
        ke_fk += 0.5 * _PANDA_MASS[i] * com_dot @ com_dot
        ke_fk += 0.5 * omega @ _PANDA_INERTIA[i] @ omega
    assert ke_m == pytest.approx(float(ke_fk), rel=2e-3)


def test_panda_rbd_energy_conservation_passive():
    """Zero torque, zero friction: total energy drift stays small over a
    short semi-implicit-Euler rollout at dt=1e-3."""
    from mpc_via_diffusion_model_tpu.dynamics import panda_mass_matrix, panda_link_transforms
    from mpc_via_diffusion_model_tpu.dynamics.arm import (
        _PANDA_COM, _PANDA_MASS, PANDA_READY_POSE, panda_inverse_dynamics,
    )

    dt = 1e-3
    q = jnp.asarray(PANDA_READY_POSE, jnp.float32)
    qd = jnp.zeros(7)

    def energy(q, qd):
        m = panda_mass_matrix(q)
        ke = 0.5 * qd @ m @ qd
        v = 0.0
        for i, (r, p) in enumerate(panda_link_transforms(q)):
            com_world = p + r @ jnp.asarray(_PANDA_COM[i], jnp.float32)
            v = v + _PANDA_MASS[i] * 9.81 * com_world[2]
        return ke + v

    def step(carry, _):
        q, qd = carry
        bias = panda_inverse_dynamics(q, qd, jnp.zeros(7))
        qdd = jnp.linalg.solve(panda_mass_matrix(q), -bias)
        qd = qd + qdd * dt
        q = q + qd * dt
        return (q, qd), None

    (q_f, qd_f), _ = jax.lax.scan(jax.jit(step), (q, qd), None, length=200)
    e0 = float(energy(q, qd))
    e1 = float(energy(q_f, qd_f))
    # 0.2 s free fall from rest: energies are O(10 J) scale changes in KE/PE
    # individually; the SUM must be conserved to integrator order
    assert abs(e1 - e0) < 0.05, (e0, e1)


def test_panda_rbd_plant_gravity_pulls_and_ilqr_regulates():
    """The full-physics plant: (a) zero torque at the ready pose falls under
    gravity (the surrogate would not move), (b) iLQR finds torques that hold
    and recover the pose."""
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.dynamics.base import rollout_with_cost
    from mpc_via_diffusion_model_tpu.solvers import ILQRConfig, ilqr_solve

    plant, cost = get_plant("panda")
    x0 = jnp.zeros(14)  # exactly the ready pose, at rest
    x1 = plant.step(x0, jnp.zeros(7))
    assert float(jnp.abs(x1[7:]).max()) > 1e-3  # gravity accelerates joints

    H = 30
    u0 = jnp.zeros((H, 7))
    xs_zero, j_zero = rollout_with_cost(plant, cost, x0, u0)
    sol = ilqr_solve(plant, cost, x0, u0, ILQRConfig(horizon=H, n_iterations=15))
    assert bool(sol.backward_ok)
    assert float(sol.cost) < float(j_zero) * 0.5
    # final posture error much smaller than free-fall's
    assert float(jnp.abs(sol.xs[-1, :7]).max()) < float(jnp.abs(xs_zero[-1, :7]).max())


def test_panda_unrolled_matches_scan_dynamics():
    """The Mosaic-safe python-unrolled RNE/mass/Cholesky path (round 5,
    `panda_rbd_unrolled`) must reproduce the scan/linalg plant to fp32
    round-off — single step and 20-step rollout."""
    import numpy as np
    from mpc_via_diffusion_model_tpu.dynamics import (
        panda_inverse_dynamics, panda_inverse_dynamics_unrolled,
        panda_rbd, panda_rbd_unrolled)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-1, 1, 7).astype(np.float32))
    qd = jnp.asarray(rng.uniform(-1, 1, 7).astype(np.float32))
    qdd = jnp.asarray(rng.uniform(-1, 1, 7).astype(np.float32))
    t1 = np.asarray(jax.jit(panda_inverse_dynamics)(q, qd, qdd))
    t2 = np.asarray(jax.jit(panda_inverse_dynamics_unrolled)(q, qd, qdd))
    np.testing.assert_allclose(t1, t2, rtol=2e-5, atol=2e-5)

    p1 = panda_rbd()
    p2 = panda_rbd_unrolled()
    x = jnp.asarray(rng.uniform(-0.3, 0.3, 14).astype(np.float32))
    u = jnp.asarray(rng.uniform(-2, 2, 7).astype(np.float32))
    s1 = np.asarray(jax.jit(p1.step)(x, u))
    s2 = np.asarray(jax.jit(p2.step)(x, u))
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)

    def roll(plant):
        def body(xc, _):
            xn = plant.step(xc, u * 0.1)
            return xn, xn
        _, xs = jax.lax.scan(body, x, None, length=20)
        return xs

    xs1 = np.asarray(jax.jit(lambda: roll(p1))())
    xs2 = np.asarray(jax.jit(lambda: roll(p2))())
    np.testing.assert_allclose(xs1, xs2, rtol=5e-4, atol=5e-4)
