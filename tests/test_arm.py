"""Panda-surrogate arm: FK sanity, context shape, closed-loop regulation."""
import numpy as np
import jax
import jax.numpy as jnp

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
