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


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 1)

    ge.dryrun_multichip(8)
