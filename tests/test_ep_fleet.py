"""Expert-parallel fleet parity: `parallel/ep_fleet.py` must reproduce each
expert's evaluation exactly, with per-expert weights sharded over the mesh.
Exercised on the real product path (a fused diffusion closed loop), not a
toy fn.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mpc_via_diffusion_model_tpu.control import make_closed_loop
from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.dynamics import get_plant
from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.parallel.ep_fleet import (
    make_ep_fleet_eval,
    stack_experts,
)


def _ep_mesh(E):
    devs = jax.devices()
    if len(devs) < E:
        pytest.skip(f"needs {E} devices")
    return Mesh(np.array(devs[:E]), axis_names=("ep",))


def _closed_loop_fn(horizon=8, n_steps=4):
    plant, cost = get_plant("pendulum")
    state_dim, control_dim = plant.state_dim, plant.control_dim
    model = TemporalUnet(
        state_dim=control_dim, n_support_points=horizon, unet_input_dim=16,
        dim_mults=(1, 2), context_dim=state_dim, conditioning_type="default",
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 6))
    stats_u = NormalizerStats(
        kind="limits",
        mins=jnp.full((control_dim,), -2.0), maxs=jnp.full((control_dim,), 2.0))
    stats_c = NormalizerStats(
        kind="limits",
        mins=jnp.full((state_dim,), -6.0), maxs=jnp.full((state_dim,), 6.0))
    loop = make_closed_loop(
        diffusion, model.apply, stats_u, stats_c, plant, cost,
        horizon=horizon, n_steps=n_steps, n_diffusion_steps_without_noise=2,
    )
    x0_default = jnp.zeros((state_dim,), jnp.float32)
    def init(seed):
        return model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((2, horizon, control_dim), jnp.float32),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, state_dim), jnp.float32),
            jnp.zeros((2, 1), jnp.float32),
        )
    return loop, init, x0_default, state_dim


@pytest.mark.parametrize("E,n_dev", [(4, 4), (8, 4)])
def test_ep_fleet_matches_sequential(E, n_dev):
    """E distinct-weight experts over an n_dev-device 'ep' mesh (incl. 2
    experts per device) == each expert's loop run alone."""
    mesh = _ep_mesh(n_dev)
    loop, init, x0_default, state_dim = _closed_loop_fn()

    params_list = [init(seed) for seed in range(E)]
    rng = np.random.RandomState(3)
    x0s = jnp.asarray(
        x0_default[None, :] + 0.1 * rng.randn(E, state_dim), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(50, 50 + E))

    stack = stack_experts(mesh, params_list)
    fleet = make_ep_fleet_eval(mesh, loop)
    got = fleet(stack, x0s, keys)

    jloop = jax.jit(loop)
    for e in range(E):
        ref = jloop(params_list[e], x0s[e], keys[e])
        got_e = jax.tree_util.tree_map(lambda a: a[e], got)
        for a, b in zip(jax.tree_util.tree_leaves(got_e),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_stack_experts_sharded_placement():
    """The stacked weights are actually sharded: each leaf's leading axis is
    split over 'ep', so per-device memory is 1/n_dev of the fleet."""
    mesh = _ep_mesh(4)
    _, init, _, _ = _closed_loop_fn()
    stack = stack_experts(mesh, [init(s) for s in range(4)])
    leaf = jax.tree_util.tree_leaves(stack)[0]
    assert len(leaf.sharding.device_set) == 4
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert all(sh[0] == 1 for sh in shard_shapes)
