"""Single-kernel CFG denoise chain vs the lax.scan sampler (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.ops.fused_denoise import make_fused_cfg_chain


@pytest.fixture(scope="module")
def setup():
    model = TemporalUnet(
        state_dim=1, n_support_points=32, unet_input_dim=32,
        dim_mults=(1, 2, 4), context_dim=5, conditioning_type="default",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 1)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 5)), jnp.zeros((2, 1)),
    )
    schedule = make_schedule("exponential", 25)
    return model, params, schedule, GaussianDiffusion(schedule=schedule)


def _reference_sample(model, params, diff, shape, key, ctx, w, n_tail):
    return diff.ddpm_cfg_sample(
        lambda x, t, c, m: model.apply(params, x, t, c, m),
        shape, key, ctx, w=w, n_diffusion_steps_without_noise=n_tail,
    )


def test_chain_matches_scan_sampler(setup):
    model, params, schedule, diff = setup
    chain = make_fused_cfg_chain(
        model, params, schedule, n_samples=1, w=0.01,
        n_diffusion_steps_without_noise=5, interpret=True,
    )
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 5), jnp.float32)
    key = jax.random.PRNGKey(3)
    got = chain(ctx, key)
    want = _reference_sample(model, params, diff, (1, 32, 1), key, ctx, 0.01, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_chain_multisample_and_w(setup):
    model, params, schedule, diff = setup
    chain = make_fused_cfg_chain(
        model, params, schedule, n_samples=3, w=1.5,
        n_diffusion_steps_without_noise=2, interpret=True,
    )
    ctx = jnp.asarray(np.random.RandomState(2).randn(3, 5), jnp.float32)
    key = jax.random.PRNGKey(7)
    got = chain(ctx, key)
    want = _reference_sample(model, params, diff, (3, 32, 1), key, ctx, 1.5, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_chain_bf16_weights_close(setup):
    """bf16 weights: same chain within bf16 rounding of the fp32 result."""
    model, params, schedule, diff = setup
    chain = make_fused_cfg_chain(
        model, params, schedule, n_samples=1, w=0.01,
        n_diffusion_steps_without_noise=5, weights_dtype=jnp.bfloat16,
        interpret=True,
    )
    ctx = jnp.asarray(np.random.RandomState(4).randn(1, 5), jnp.float32)
    key = jax.random.PRNGKey(9)
    got = chain(ctx, key)
    want = _reference_sample(model, params, diff, (1, 32, 1), key, ctx, 0.01, 5)
    assert np.all(np.isfinite(np.asarray(got)))
    # bf16 matmuls accumulate ~1e-2 absolute error over 30 steps in the
    # NORMALIZED space; the limits-unnormalize clip keeps it bounded
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=8e-2)
