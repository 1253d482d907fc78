"""Scene-conditioned Panda planning building blocks (scripts/scene_panda.py).

Covers the scene-distribution pieces the fixed-world planning3d tests don't:
world sampling bounds/determinism, the scene-TRACED GPMP generator (one
compiled program, any world — endpoints pinned, valid flags honest), and the
in-jit free-mask agreeing with `eval/planning_metrics.planning_metrics` on
the same dense interpolation (reference metric block,
`/root/reference/scripts/inference/inference_(mpd).py:306-343`)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from scene_panda import _C_HI, _C_LO, _R_HI, _R_LO, N_SPHERES, sample_worlds

from mpc_via_diffusion_model_tpu.data.trajectories import (
    generate_arm_trajectories_gpmp,
)
from mpc_via_diffusion_model_tpu.envs.planning2d import interpolate_points
from mpc_via_diffusion_model_tpu.envs.planning3d import (
    PandaArmEnv3D, PlanningEnv3D,
)
from mpc_via_diffusion_model_tpu.eval.planning_metrics import planning_metrics

FIXED_BOXES = jnp.array([[0.0, 0.0, -0.17, 1.2, 1.2, 0.05]], jnp.float32)


def test_sample_worlds_bounds_and_determinism():
    w = sample_worlds(16, seed=3)
    assert w.shape == (16, N_SPHERES, 4)
    assert (w[..., :3] >= _C_LO).all() and (w[..., :3] <= _C_HI).all()
    assert (w[..., 3] >= _R_LO).all() and (w[..., 3] <= _R_HI).all()
    np.testing.assert_array_equal(w, sample_worlds(16, seed=3))
    assert not np.array_equal(w, sample_worlds(16, seed=4))


def test_scene_traced_generator_one_compile():
    """One jitted generator serves DIFFERENT worlds without retracing, pins
    endpoints, and its valid flags match a direct clearance recheck."""
    n_trace = 0

    @jax.jit
    def gen(spheres, key):
        nonlocal n_trace
        n_trace += 1
        env = PandaArmEnv3D(PlanningEnv3D(spheres, FIXED_BOXES))
        return generate_arm_trajectories_gpmp(
            env, key, n_tasks=2, n_trajs_per_task=2, horizon=16,
            n_opt_steps=30)

    worlds = sample_worlds(2, seed=0)
    for s in range(2):
        trajs, valid = jax.device_get(
            gen(jnp.asarray(worlds[s]), jax.random.PRNGKey(s)))
        assert trajs.shape == (4, 16, 7) and valid.shape == (4,)
        env = PandaArmEnv3D(PlanningEnv3D(jnp.asarray(worlds[s]), FIXED_BOXES))
        clear = np.asarray(env.sdf(jnp.asarray(trajs)))  # (4, 16)
        np.testing.assert_array_equal(valid, (clear > 0.0).all(axis=1))
        # starts/goals are the optimizer's fixed endpoints: still free
        assert (clear[:, 0] > 0).all() and (clear[:, -1] > 0).all()
    assert n_trace == 1, "generator retraced — worlds are not traced values"


def test_in_jit_free_mask_matches_planning_metrics():
    """The fused eval free-mask (scene_panda's sampler) reproduces
    planning_metrics' fraction_free on the same trajectories."""
    world = jnp.asarray(sample_worlds(1, seed=7)[0])
    env = PandaArmEnv3D(PlanningEnv3D(world, FIXED_BOXES))
    key = jax.random.PRNGKey(1)
    # straight-line q-space trajs between random configs: some collide
    q = jax.random.uniform(key, (6, 2, 7), minval=-1.5, maxval=1.5)
    t = jnp.linspace(0.0, 1.0, 16)[None, :, None]
    trajs = q[:, :1] * (1 - t) + q[:, 1:] * t  # (6, 16, 7)

    @jax.jit
    def free_mask(spheres, trajs):
        e = PandaArmEnv3D(PlanningEnv3D(spheres, FIXED_BOXES))
        dense = interpolate_points(trajs, 64)
        in_coll = jnp.logical_or(e.in_collision(dense),
                                 jnp.any(jnp.isnan(dense), axis=-1))
        return ~jnp.any(in_coll, axis=-1)

    free = np.asarray(free_mask(world, trajs))
    m = planning_metrics(env, trajs, num_interpolated_points=64)
    assert abs(m["fraction_free"] - free.mean()) < 1e-6
    assert m["success"] == float(free.any())
