"""3-D / articulated planning environment (envs/planning3d.py).

Covers the VERDICT r3 #4 component: sphere/box SDF world, Panda FK
collision spheres, configuration-space clearance + guide differentiation,
GPMP arm-trajectory generation, and the duck-typed metric path
(`eval/planning_metrics` on joint trajectories). Reference behavior being
matched: torch_robotics env/robot planning stack,
`/root/reference/mpd/datasets/trajectories.py:44-55` and
`inference_(mpd).py:170-343`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_via_diffusion_model_tpu.dynamics.arm import PANDA_READY_POSE, panda_fk
from mpc_via_diffusion_model_tpu.envs import (
    ENV_SPHERES_3D, PANDA_Q_MAX, PANDA_Q_MIN, PlanningEnv3D,
    make_panda_arm_env,
)


def test_sdf_sphere_exact():
    env = PlanningEnv3D(
        spheres=jnp.array([[0.0, 0.0, 0.0, 0.5]]),
        boxes=jnp.zeros((0, 6)),
    )
    # outside: distance to surface
    assert np.isclose(float(env.sdf(jnp.array([2.0, 0.0, 0.0]))), 1.5, atol=1e-5)
    # inside: negative
    assert float(env.sdf(jnp.array([0.1, 0.0, 0.0]))) < 0


def test_sdf_box_exact():
    env = PlanningEnv3D(
        spheres=jnp.zeros((0, 4)),
        boxes=jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]]),
    )
    assert np.isclose(float(env.sdf(jnp.array([3.0, 0.0, 0.0]))), 2.0, atol=1e-5)
    # corner distance = sqrt(3) from (2,2,2) to corner (1,1,1)
    assert np.isclose(float(env.sdf(jnp.array([2.0, 2.0, 2.0]))),
                      np.sqrt(3.0), atol=1e-4)
    assert float(env.sdf(jnp.zeros(3))) < 0  # deep inside


def test_collision_spheres_track_fk():
    """The gripper-body sphere must ride near the FK end-effector."""
    env = make_panda_arm_env()
    q = jnp.asarray(PANDA_READY_POSE)
    pos = env.sphere_positions(q)
    ee = panda_fk(q)
    d = float(jnp.linalg.norm(pos[-1] - ee))
    assert d < 0.25, f"gripper sphere {d} m from the FK end-effector"


def test_config_collision_detected_at_obstacle():
    """Put a sphere obstacle exactly at the ready pose's EE: that config
    must be in collision, and a retracted config must be free."""
    q = jnp.asarray(PANDA_READY_POSE)
    ee = panda_fk(q)
    world = PlanningEnv3D(
        spheres=jnp.concatenate([ee, jnp.array([0.15])])[None, :],
        boxes=jnp.zeros((0, 6)),
    )
    env = make_panda_arm_env(world, self_collision=False)
    assert bool(env.in_collision(q[None])[0])
    assert float(env.config_clearance(q)) < 0


def test_clearance_grad_finite_and_vmappable():
    env = make_panda_arm_env()
    q = jnp.asarray(PANDA_READY_POSE)
    g = jax.grad(lambda qq: env.config_clearance(qq))(q)
    assert bool(jnp.isfinite(g).all())
    qb = jnp.stack([q, q + 0.1, q - 0.1])
    d = env.sdf(qb)
    assert d.shape == (3,) and bool(jnp.isfinite(d).all())


def test_random_free_configs_are_free_and_within_limits():
    env = make_panda_arm_env()
    qs = env.random_free_points(jax.random.PRNGKey(0), 8)
    assert qs.shape == (8, 7)
    assert bool((env.sdf(qs) > 0).all())
    assert bool((qs >= jnp.asarray(PANDA_Q_MIN) - 1e-5).all())
    assert bool((qs <= jnp.asarray(PANDA_Q_MAX) + 1e-5).all())


def test_generate_arm_trajectories_endpoints_and_validity():
    from mpc_via_diffusion_model_tpu.data.trajectories import (
        generate_arm_trajectories_gpmp,
    )

    env = make_panda_arm_env()
    trajs, valid = generate_arm_trajectories_gpmp(
        env, jax.random.PRNGKey(1), n_tasks=3, n_trajs_per_task=2,
        horizon=24, n_opt_steps=100)
    assert trajs.shape == (6, 24, 7)
    assert int(np.asarray(valid).sum()) >= 4  # most optimizations succeed
    # optimizer must not move the hard endpoints
    for i in range(0, 6, 2):
        np.testing.assert_allclose(np.asarray(trajs[i, 0]),
                                   np.asarray(trajs[i + 1, 0]), atol=1e-6)


def test_planning_metrics_duck_type_on_arm_env():
    from mpc_via_diffusion_model_tpu.eval.planning_metrics import (
        get_best_index, planning_metrics,
    )

    env = make_panda_arm_env()
    q0 = jnp.asarray(PANDA_READY_POSE)
    # two trajectories: one static at a free config (free), one swept into
    # the table slab (colliding)
    free = jnp.tile(q0, (12, 1))
    crash = jnp.tile(q0, (12, 1)).at[:, 1].add(jnp.linspace(0.0, 1.6, 12))
    trajs = jnp.stack([free, crash])
    m = planning_metrics(env, trajs, num_interpolated_points=24)
    assert m["success"] == 1.0
    assert 0.0 < m["fraction_free"] <= 1.0
    assert get_best_index(env, trajs, num_interpolated_points=24) == 0


def test_config_collision_guide_grads():
    from mpc_via_diffusion_model_tpu.diffusion import (
        config_collision_avoidance_guide, make_guide,
    )

    env = make_panda_arm_env()
    guide = make_guide([(config_collision_avoidance_guide(env), 1.0)],
                       clip_grad=True, scale=0.1)
    x = jnp.tile(jnp.asarray(PANDA_READY_POSE), (2, 16, 1))
    g = guide(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    # endpoint protection (hard conds)
    assert float(jnp.abs(g[:, 0]).max()) == 0.0
    assert float(jnp.abs(g[:, -1]).max()) == 0.0
