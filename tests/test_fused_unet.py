"""Fused Pallas U-Net vs the flax reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
from mpc_via_diffusion_model_tpu.ops.fused_unet import make_fused_unet


@pytest.mark.parametrize("bsz,horizon,du,cond", [(2, 32, 1, 5), (4, 16, 2, 4)])
def test_fused_matches_flax(bsz, horizon, du, cond):
    model = TemporalUnet(
        state_dim=du, n_support_points=horizon, unet_input_dim=32,
        dim_mults=UNET_DIM_MULTS[0], context_dim=cond, conditioning_type="default",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (bsz, horizon, du))
    t = jnp.arange(bsz) * 3
    ctx = jax.random.normal(jax.random.PRNGKey(1), (bsz, cond))
    mask = (jnp.arange(bsz) % 2).astype(jnp.float32)[:, None]
    params = model.init(jax.random.PRNGKey(2), x, t, ctx, mask)

    want = model.apply(params, x, t, ctx, mask)
    fused = make_fused_unet(model, params, batch_size=bsz, interpret=True)
    got = fused(x, t, ctx, mask)
    # CPU fp32 on both paths -> tight tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-5)


def test_fused_rejects_wrong_batch():
    model = TemporalUnet(
        state_dim=1, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2),
        context_dim=3, conditioning_type="default",
    )
    x = jnp.zeros((2, 16, 1))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 3))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, jnp.zeros((2, 1)))
    fused = make_fused_unet(model, params, batch_size=2, interpret=True)
    with pytest.raises(AssertionError):
        fused(jnp.zeros((3, 16, 1)), jnp.zeros((3,), jnp.int32), jnp.zeros((3, 3)), jnp.zeros((3, 1)))


def test_fused_matches_flax_with_cfg_indicator():
    model = TemporalUnet(
        state_dim=1, n_support_points=16, unet_input_dim=16, dim_mults=(1, 2),
        context_dim=4, conditioning_type="default", cfg_indicator=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 1))
    t = jnp.array([1, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    mask = jnp.array([[0.0], [1.0]])
    params = model.init(jax.random.PRNGKey(2), x, t, ctx, mask)
    want = model.apply(params, x, t, ctx, mask)
    fused = make_fused_unet(model, params, batch_size=2, interpret=True)
    got = fused(x, t, ctx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-5)
