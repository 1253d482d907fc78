"""Channel-sharded TP on the temporal U-Net: numeric parity vs the unsharded
flax model (column/row-parallel conv pairs + group-aligned GroupNorm + one
psum per ResBlock) — the SURVEY §2.4 'model'-axis artifact on the REAL
denoiser, not the MLP demo."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
from mpc_via_diffusion_model_tpu.parallel.tp_unet import (
    make_tp_unet_apply,
    unet_apply_functional,
)


def _flagship_model():
    # the 1M-param production CFG denoiser (BASELINE.md checkpoint config)
    return TemporalUnet(
        state_dim=1, n_support_points=32, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=5, conditioning_type="default",
    )


def _init(model, batch=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(batch, model.n_support_points, model.state_dim),
                    jnp.float32)
    t = jnp.asarray(rng.randint(0, 25, size=(batch,)), jnp.int32)
    ctx = jnp.asarray(rng.randn(batch, model.context_dim), jnp.float32)
    mask = jnp.asarray((rng.rand(batch, 1) < 0.5), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x, t, ctx, mask)
    return params, x, t, ctx, mask


def test_functional_forward_matches_flax():
    """The no-flax functional forward (the semantics TP shards) is
    bit-compatible with model.apply."""
    model = _flagship_model()
    params, x, t, ctx, mask = _init(model)
    ref = model.apply(params, x, t, ctx, mask)
    out = unet_apply_functional(model, params, x, t, ctx, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("m", [2, 4])
def test_tp_unet_matches_unsharded(m):
    devs = jax.devices()
    if len(devs) < m:
        pytest.skip(f"needs {m} devices")
    mesh = Mesh(np.array(devs[:m]), axis_names=("model",))

    model = _flagship_model()
    params, x, t, ctx, mask = _init(model, seed=m)
    ref = model.apply(params, x, t, ctx, mask)
    out = make_tp_unet_apply(mesh, model, params)(x, t, ctx, mask)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tp_unet_hybrid_mesh_highdim():
    """TP on the 'model' axis of a hybrid (4, 2) mesh, on a high-dimensional
    config (panda-shaped: horizon 128, 7 channels, 20-dim context)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(4, 2), axis_names=("data", "model"))

    model = TemporalUnet(
        state_dim=7, n_support_points=128, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=20, conditioning_type="default",
    )
    params, x, t, ctx, mask = _init(model, batch=2, seed=7)
    ref = model.apply(params, x, t, ctx, mask)
    out = make_tp_unet_apply(mesh, model, params)(x, t, ctx, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tp_unet_unconditional():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(devs[:2]), axis_names=("model",))
    model = TemporalUnet(state_dim=2, n_support_points=16, unet_input_dim=32,
                         dim_mults=(1, 2), conditioning_type=None)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 2), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(3), x, t)
    ref = model.apply(params, x, t)
    out = make_tp_unet_apply(mesh, model, params)(x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tp_unet_rejects_misaligned_mesh():
    devs = jax.devices()
    if len(devs) < 3:
        pytest.skip("needs 3 devices")
    mesh = Mesh(np.array(devs[:3]), axis_names=("model",))
    model = _flagship_model()
    params, *_ = _init(model, batch=1)
    with pytest.raises(AssertionError, match="group"):
        make_tp_unet_apply(mesh, model, params)


def test_tp_unet_wide_scaled_config():
    """TP parity at the SCALED config the machinery exists for (VERDICT r3
    next #5 / scripts/bench_scaled_unet.py 'wide' row, shrunk to H=64 and
    dim 64 to keep CPU runtime sane): dim_mults (1,2,4,8) — four levels,
    widest block 512 channels — over a 4-way 'model' mesh."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), axis_names=("model",))

    model = TemporalUnet(
        state_dim=4, n_support_points=64, unet_input_dim=64,
        dim_mults=UNET_DIM_MULTS[1], context_dim=12,
        conditioning_type="default", cfg_indicator=True,
    )
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 64, 4), jnp.float32)
    t = jnp.asarray(rng.randint(0, 25, size=(2,)), jnp.int32)
    ctx = jnp.asarray(rng.randn(2, 12), jnp.float32)
    mask = jnp.zeros((2, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(7), x, t, ctx, mask)

    ref = model.apply(params, x, t, ctx, mask)
    tp = make_tp_unet_apply(mesh, model, params)
    out = tp(x, t, ctx, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
