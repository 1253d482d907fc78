"""Trainer: jitted step, EMA semantics, NaN guard, checkpoint round-trip."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.models import PointUnet
from mpc_via_diffusion_model_tpu.train import (
    TrainState,
    Trainer,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def setup():
    model = PointUnet(state_dim=2, dim=8, context_dim=3, conditioning_type="default")
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 5))
    x = jnp.zeros((4, 1, 2))
    t = jnp.zeros((4,), jnp.int32)
    ctx = jnp.zeros((4, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, jnp.zeros((4, 1)))
    return model, diffusion, params


def _mk_state(params, optimizer):
    return TrainState(
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params),
        step=jnp.int32(0),
    )


def test_train_step_decreases_loss(setup):
    model, diffusion, params = setup
    optimizer = make_optimizer(1e-3)
    step = jax.jit(make_train_step(diffusion, model.apply, optimizer, step_start_ema=2, update_ema_every=1))
    state = _mk_state(params, optimizer)

    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(32, 1, 2) * 0.5, jnp.float32)
    cond = jnp.asarray(rng.randn(32, 3) * 0.5, jnp.float32)

    losses = []
    for i in range(300):
        key, k = jax.random.split(key)
        state, metrics = step(state, inputs, cond, k)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 300
    # the diffusion loss is noisy step-to-step (random t); compare broad means
    assert np.mean(losses[-50:]) < np.mean(losses[:50]) * 0.9


def test_ema_hard_copy_then_decay(setup):
    model, diffusion, params = setup
    optimizer = make_optimizer(1e-2)
    step = jax.jit(make_train_step(
        diffusion, model.apply, optimizer, ema_decay=0.5, step_start_ema=3, update_ema_every=1,
    ))
    state = _mk_state(params, optimizer)
    key = jax.random.PRNGKey(2)
    inputs = jnp.ones((8, 1, 2)) * 0.3
    cond = jnp.ones((8, 3)) * 0.1

    # steps 1, 2: ema hard-copies params
    for i in range(2):
        key, k = jax.random.split(key)
        state, _ = step(state, inputs, cond, k)
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    e0 = jax.tree_util.tree_leaves(state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(e0))

    # after step_start_ema: ema lags params
    for i in range(5):
        key, k = jax.random.split(key)
        state, _ = step(state, inputs, cond, k)
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    e1 = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert float(jnp.max(jnp.abs(p1 - e1))) > 0


def test_nan_guard_skips_update(setup):
    model, diffusion, params = setup
    optimizer = make_optimizer(1e-3)
    step = jax.jit(make_train_step(diffusion, model.apply, optimizer))
    state = _mk_state(params, optimizer)
    inputs = jnp.full((4, 1, 2), jnp.nan)
    cond = jnp.zeros((4, 3))
    new_state, metrics = step(state, inputs, cond, jax.random.PRNGKey(0))
    assert bool(metrics["update_skipped"])
    p_old = jax.tree_util.tree_leaves(state.params)[0]
    p_new = jax.tree_util.tree_leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(p_old), np.asarray(p_new))


def test_checkpoint_round_trip(setup, tmp_path):
    model, diffusion, params = setup
    optimizer = make_optimizer(1e-3)
    state = _mk_state(params, optimizer)
    path = os.path.join(str(tmp_path), "ck", "test.ckpt")
    save_checkpoint(path, state, extra={"note": "hi"})
    loaded, extra = load_checkpoint(path)
    assert extra["note"] == "hi"
    assert int(loaded.step) == 0
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_fit_and_resume(setup, tmp_path):
    model, diffusion, params = setup
    rng = np.random.RandomState(1)
    ds = ControlSequenceDataset.from_arrays(
        rng.randn(64, 1, 2).astype(np.float32), rng.randn(64, 3).astype(np.float32)
    )
    trainer = Trainer(
        diffusion, model.apply, params, lr=1e-3, checkpoint_dir=str(tmp_path),
    )
    trainer.fit(ds, num_train_steps=20, batch_size=16, steps_til_summary=10,
                steps_til_checkpoint=10, log_fn=lambda s: None)
    assert int(trainer.state.step) == 20
    assert os.path.exists(os.path.join(str(tmp_path), "final.ckpt"))
    assert os.path.exists(os.path.join(str(tmp_path), "train_losses.npy"))

    # resume continues from the saved step
    trainer2 = Trainer(diffusion, model.apply, params, lr=1e-3, checkpoint_dir=str(tmp_path))
    trainer2.resume(os.path.join(str(tmp_path), "current.ckpt"))
    assert int(trainer2.state.step) == 20
    trainer2.fit(ds, num_train_steps=25, batch_size=16, steps_til_summary=100, log_fn=lambda s: None)
    assert int(trainer2.state.step) == 25


def test_scanned_train_steps(setup):
    """One dispatch per chunk must give the same kind of progress as the
    per-step loop and advance the step counter by n_inner."""
    from mpc_via_diffusion_model_tpu.train import make_scanned_train_steps

    model, diffusion, params = setup
    optimizer = make_optimizer(1e-3)
    step = make_train_step(diffusion, model.apply, optimizer, step_start_ema=10, update_ema_every=2)
    chunk = make_scanned_train_steps(step, n_inner=50)
    chunk_jit = jax.jit(lambda st, a, b, k: chunk(st, a, b, k, 16))
    state = _mk_state(params, optimizer)

    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(128, 1, 2) * 0.5, jnp.float32)
    cond = jnp.asarray(rng.randn(128, 3) * 0.5, jnp.float32)

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(6):
        key, k = jax.random.split(key)
        state, loss = chunk_jit(state, inputs, cond, k)
        losses.append(float(loss))
    assert int(state.step) == 300
    assert losses[-1] < losses[0]


def test_trainer_fit_chunked(setup, tmp_path):
    """fit(chunk_size=N) runs the scanned path: same final step count,
    checkpoints written, loss history recorded (VERDICT r1 item 8)."""
    model, diffusion, params = setup
    rng = np.random.RandomState(2)
    ds = ControlSequenceDataset.from_arrays(
        rng.randn(64, 1, 2).astype(np.float32), rng.randn(64, 3).astype(np.float32)
    )
    trainer = Trainer(diffusion, model.apply, params, lr=1e-3, checkpoint_dir=str(tmp_path))
    trainer.fit(ds, num_train_steps=40, batch_size=16, steps_til_summary=20,
                steps_til_checkpoint=20, chunk_size=10, log_fn=lambda s: None)
    assert int(trainer.state.step) == 40
    assert os.path.exists(os.path.join(str(tmp_path), "final.ckpt"))
    assert os.path.exists(os.path.join(str(tmp_path), "step_000020.ckpt"))
    assert len(trainer.train_losses) >= 2


def test_summary_fn_receives_training_step(setup):
    """fit() passes the TRAINING step to summary hooks that accept one
    (wandb drops logs whose step regresses, so images logged inside a
    summary must ride the same step axis as the scalar metrics); plain
    fn(params, key) hooks keep working."""
    model, diffusion, params = setup
    rng = np.random.RandomState(2)
    ds = ControlSequenceDataset.from_arrays(
        rng.randn(64, 1, 2).astype(np.float32),
        rng.randn(64, 3).astype(np.float32))

    seen = []

    def summary3(p, k, step=None):
        seen.append(step)
        return {"s3": 0.0}

    Trainer(diffusion, model.apply, params, lr=1e-3).fit(
        ds, num_train_steps=20, batch_size=16, steps_til_summary=10,
        summary_fn=summary3, log_fn=lambda s: None)
    assert seen == [1, 10, 20]  # monotonic real steps, never None

    seen2 = []

    def summary2(p, k):
        seen2.append(1)
        return {"s2": 0.0}

    Trainer(diffusion, model.apply, params, lr=1e-3).fit(
        ds, num_train_steps=10, batch_size=16, steps_til_summary=5,
        summary_fn=summary2, log_fn=lambda s: None)
    assert len(seen2) == 3


def test_fit_mlp_regression_learns_linear_map():
    """The shared amortization regressor (train.regression) drives a tiny
    MLP's MSE down on a deterministic linear target and returns EMA params
    usable through model.apply."""
    from mpc_via_diffusion_model_tpu.models import AMPCNet
    from mpc_via_diffusion_model_tpu.train import fit_mlp_regression

    H, D = 4, 3
    key = jax.random.PRNGKey(0)
    conds = jax.random.normal(key, (256, D))
    w = jax.random.normal(jax.random.PRNGKey(1), (D, H))
    inputs = jnp.tanh(conds @ w)[..., None]  # (256, H, 1)

    model = AMPCNet(horizon=H, control_dim=1, hidden=(32, 32))
    params, loss = fit_mlp_regression(
        model, inputs, conds, steps=400, chunk=100, batch_size=64,
        lr=3e-3, seed=0)
    assert loss < 0.02
    pred = model.apply(params, conds[:8])
    assert pred.shape == (8, H, 1)
    assert float(jnp.mean(jnp.square(pred - inputs[:8]))) < 0.05
