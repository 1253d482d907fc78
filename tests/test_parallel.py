"""Data-parallel training over the 8-device virtual CPU mesh: the dp step
must produce the same update a single device would (pmean-grad identity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.models import PointUnet
from mpc_via_diffusion_model_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from mpc_via_diffusion_model_tpu.train import TrainState, make_optimizer


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_dp_train_step_runs_and_syncs():
    model = PointUnet(state_dim=2, dim=8, context_dim=3, conditioning_type="default")
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    x = jnp.zeros((2, 1, 2))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, jnp.zeros((2, 1)))

    mesh = make_mesh(8)
    optimizer = make_optimizer(1e-3)
    step = make_dp_train_step(mesh, diffusion, model.apply, optimizer)

    state = TrainState(
        params=replicate(mesh, params),
        ema_params=replicate(mesh, jax.tree_util.tree_map(jnp.copy, params)),
        opt_state=replicate(mesh, optimizer.init(params)),
        step=jnp.int32(0),
    )
    rng = np.random.RandomState(0)
    inputs = shard_batch(mesh, jnp.asarray(rng.randn(16, 1, 2), jnp.float32))
    cond = shard_batch(mesh, jnp.asarray(rng.randn(16, 3), jnp.float32))

    new_state, metrics = step(state, inputs, cond, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params changed and are fully replicated (no per-device divergence)
    p_new = jax.tree_util.tree_leaves(new_state.params)[0]
    p_old = jax.tree_util.tree_leaves(state.params)[0]
    assert float(jnp.max(jnp.abs(p_new - p_old))) > 0

    # run a few more steps: loss stays finite
    key = jax.random.PRNGKey(2)
    for i in range(3):
        key, k = jax.random.split(key)
        new_state, metrics = step(new_state, inputs, cond, k)
    assert np.isfinite(float(metrics["loss"]))


def _tiny_setup():
    model = PointUnet(state_dim=2, dim=8, context_dim=3, conditioning_type="default")
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    x = jnp.zeros((2, 1, 2))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, jnp.zeros((2, 1)))
    return model, diffusion, params


def _dp_state(mesh, params, optimizer):
    return TrainState(
        params=replicate(mesh, params),
        ema_params=replicate(mesh, jax.tree_util.tree_map(jnp.copy, params)),
        opt_state=replicate(mesh, optimizer.init(params)),
        step=jnp.int32(0),
    )


def test_dp_train_step_device_count_parity():
    """The same global batch + key must produce the same update on a
    1-device and an 8-device mesh (per-sample keys by global index)."""
    model, diffusion, params = _tiny_setup()
    optimizer = make_optimizer(1e-3)
    rng = np.random.RandomState(1)
    inputs = jnp.asarray(rng.randn(16, 1, 2), jnp.float32)
    cond = jnp.asarray(rng.randn(16, 3), jnp.float32)
    key = jax.random.PRNGKey(5)

    outs = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        step = make_dp_train_step(mesh, diffusion, model.apply, optimizer)
        state = _dp_state(mesh, params, optimizer)
        new_state, metrics = step(
            state, shard_batch(mesh, inputs), shard_batch(mesh, cond), key
        )
        outs[n] = (jax.device_get(new_state.params), float(metrics["loss"]))

    np.testing.assert_allclose(outs[1][1], outs[8][1], rtol=1e-5)
    for p1, p8 in zip(
        jax.tree_util.tree_leaves(outs[1][0]), jax.tree_util.tree_leaves(outs[8][0])
    ):
        # Adam rescales tiny grad-reduction-order differences; 1e-5 bounds
        # the fp32 reduction-order effect while still catching any real
        # per-sample-key mismatch (which would shift most elements by ~1e-3)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


def test_sharded_eval_matches_vmap():
    """make_sharded_eval over the 8-device mesh reproduces the plain vmap
    sweep (numeric parity of the sharded closed-loop path)."""
    from mpc_via_diffusion_model_tpu.control import make_closed_loop
    from mpc_via_diffusion_model_tpu.data.normalization import NormalizerStats
    from mpc_via_diffusion_model_tpu.dynamics import get_plant
    from mpc_via_diffusion_model_tpu.parallel import make_sharded_eval

    plant, cost = get_plant("pendulum")
    model = PointUnet(
        state_dim=plant.control_dim, dim=8, context_dim=plant.state_dim,
        conditioning_type="default",
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    horizon = 8
    x = jnp.zeros((2, horizon, plant.control_dim))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, plant.state_dim)), jnp.zeros((2, 1)),
    )
    ident = NormalizerStats(
        mins=jnp.zeros((1,)), maxs=jnp.ones((1,)),
        means=jnp.zeros((1,)), stds=jnp.ones((1,)), kind="identity",
    )
    ident_x = NormalizerStats(
        mins=jnp.zeros((plant.state_dim,)), maxs=jnp.ones((plant.state_dim,)),
        means=jnp.zeros((plant.state_dim,)), stds=jnp.ones((plant.state_dim,)),
        kind="identity",
    )
    loop = make_closed_loop(
        diffusion, model.apply, ident, ident_x, plant, cost,
        horizon=horizon, n_steps=4, n_diffusion_steps_without_noise=1,
    )
    x0s = jnp.asarray(np.random.RandomState(2).randn(8, plant.state_dim), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)

    plain = jax.jit(jax.vmap(lambda x0, k: loop(params, x0, k)))(x0s, keys)
    mesh = make_mesh(8)
    sharded = make_sharded_eval(mesh, loop)(params, x0s, keys)

    for a, b in zip(jax.tree_util.tree_leaves(plain), jax.tree_util.tree_leaves(sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 1)

    ge.dryrun_multichip(8)
