"""Tensor-parallel TRAINING parity: the 2-D (data, model) train step in
`parallel/tp_train.py` must reproduce the single-device trainer update
exactly — params AND EMA — through the `gather_tp_params` checkpoint export.

Also locks the round-trip property weights_to_params(_extract_weights(p)) == p
that the export rests on.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.ops.fused_unet import _extract_weights
from mpc_via_diffusion_model_tpu.parallel.mesh import (
    make_dp_train_step,
    make_mesh,
    replicate,
)
from mpc_via_diffusion_model_tpu.parallel.tp_train import (
    make_tp_train_state,
    make_tp_train_step,
    tp_state_to_flax,
)
from mpc_via_diffusion_model_tpu.parallel.tp_unet import (
    gather_tp_params,
    shard_unet_params,
    weights_to_params,
)
from mpc_via_diffusion_model_tpu.train import TrainState, make_optimizer


def _small_model():
    # small enough to compile a grad step quickly; groups divisible by m=2
    return TemporalUnet(
        state_dim=2, n_support_points=16, unet_input_dim=16,
        dim_mults=(1, 2), context_dim=3, conditioning_type="default",
    )


def _init(model, batch, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(
        rng.randn(batch, model.n_support_points, model.state_dim), jnp.float32)
    ctx = jnp.asarray(rng.randn(batch, model.context_dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x, jnp.zeros((batch,), jnp.int32),
                        ctx, jnp.zeros((batch, 1), jnp.float32))
    return params, x, ctx


def _assert_trees_close(got, ref):
    """Bulk-tight comparison: >=99.5% of elements within (2e-4, 2e-6), ALL
    within 3e-3 absolute. Adam divides by sqrt(nu)+eps, so an element whose
    gradient is ~0 can flip sign under fp32 reduction-order differences and
    move by up to ~lr per step — rare single-element outliers are numerical
    noise, while a real semantics bug (e.g. m-scaled grads) shifts whole
    leaves and fails the bulk criterion."""
    leaves_g, treedef_g = jax.tree_util.tree_flatten(got)
    leaves_r, treedef_r = jax.tree_util.tree_flatten(ref)
    assert treedef_g == treedef_r
    diffs = np.concatenate([
        np.abs(np.asarray(g) - np.asarray(r)).ravel()
        for g, r in zip(leaves_g, leaves_r)])
    tols = np.concatenate([
        (2e-6 + 2e-4 * np.abs(np.asarray(r))).ravel() for r in leaves_r])
    frac_ok = float(np.mean(diffs <= tols))
    assert frac_ok >= 0.995, f"only {frac_ok:.4%} of elements bulk-tight"
    assert float(diffs.max()) < 3e-3, f"worst element off by {diffs.max():.2e}"


def test_weights_roundtrip_exact():
    model = _small_model()
    params, _, _ = _init(model, 2)
    w, _ = _extract_weights(model, params)
    rebuilt = weights_to_params(model, w)
    leaves_a = jax.tree_util.tree_leaves(params)
    leaves_b = jax.tree_util.tree_leaves(rebuilt)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(rebuilt)
    for a, b in zip(leaves_a, leaves_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_shard_gather_roundtrip_exact():
    model = _small_model()
    params, _, _ = _init(model, 2, seed=1)
    shd, rep, _, _ = shard_unet_params(model, params, m=2)
    rebuilt = gather_tp_params(model, shd, rep)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rebuilt)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def _reference_run(model, diffusion, params, batches, keys, **ema_kw):
    """Single-device ground truth: the DP train step on a 1-device 'data'
    mesh (per-sample-key semantics, optax clip+adam, in-step EMA)."""
    mesh1 = make_mesh(1, devices=jax.devices()[:1])
    optimizer = make_optimizer(lr=3e-3)
    step = make_dp_train_step(mesh1, diffusion, model.apply, optimizer, **ema_kw)
    state = TrainState(
        params=replicate(mesh1, params),
        ema_params=replicate(mesh1, jax.tree_util.tree_map(jnp.copy, params)),
        opt_state=replicate(mesh1, optimizer.init(params)),
        step=jnp.int32(0),
    )
    losses = []
    for (x, ctx), k in zip(batches, keys):
        state, metrics = step(state, x, ctx, k)
        losses.append(float(metrics["loss"]))
    return state, losses


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 2)])
def test_tp_train_matches_single_device(mesh_shape):
    """4 train steps on a (data, model) mesh == 4 single-device trainer steps,
    for both params and EMA (EMA decay path exercised via step_start_ema=2)."""
    nd = mesh_shape[0] * mesh_shape[1]
    devs = jax.devices()
    if len(devs) < nd:
        pytest.skip(f"needs {nd} devices")
    mesh = Mesh(np.array(devs[:nd]).reshape(mesh_shape),
                axis_names=("data", "model"))

    model = _small_model()
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", 8))
    params, _, _ = _init(model, 2)

    batch = 4
    rng = np.random.RandomState(42)
    batches = [
        (jnp.asarray(rng.randn(batch, 16, 2), jnp.float32),
         jnp.asarray(rng.randn(batch, 3), jnp.float32))
        for _ in range(4)
    ]
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    ema_kw = dict(step_start_ema=2, update_ema_every=2)

    ref_state, ref_losses = _reference_run(
        model, diffusion, params, batches, keys, **ema_kw)

    tp_state = make_tp_train_state(mesh, model, params)
    tp_step = make_tp_train_step(mesh, model, diffusion, **ema_kw)
    tp_losses = []
    for (x, ctx), k in zip(batches, keys):
        tp_state, metrics = tp_step(tp_state, x, ctx, k)
        tp_losses.append(float(metrics["loss"]))
        assert not bool(metrics["update_skipped"])

    np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-5)
    assert int(tp_state["step"]) == 4 and int(tp_state["count"]) == 4

    got_params, got_ema = tp_state_to_flax(model, tp_state)
    _assert_trees_close(got_params, ref_state.params)
    _assert_trees_close(got_ema, ref_state.ema_params)
    # EMA decay actually ran (ema != params after step_start_ema)
    d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(got_ema),
        jax.tree_util.tree_leaves(got_params)))
    assert d > 0.0
