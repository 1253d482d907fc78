"""Diffusion core vs a line-by-line numpy oracle of the reference sampler.

The oracle re-implements `diffusion_model_base.py` / `sample_functions.py`
math verbatim in numpy; a synthetic linear 'denoiser' makes every step
deterministic given injected noise, so single steps and whole trajectories
can be compared exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion, apply_hard_conds

T = 25
B, H, D = 2, 8, 1
W_CFG = 0.01


def _tables():
    s = make_schedule("exponential", T)
    return {k: np.asarray(getattr(s, k), dtype=np.float64) for k in (
        "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
        "posterior_mean_coef1", "posterior_mean_coef2",
        "posterior_log_variance_clipped", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "alphas_cumprod",
    )}


def _fake_model(x, t, context, mask):
    """Synthetic denoiser: linear in x, context contributes unless masked."""
    ctx_eff = context * (1.0 - mask)
    return 0.1 * x + 0.05 * np.sum(np.asarray(ctx_eff), axis=-1, keepdims=True)[:, None, :] * np.ones_like(x)


def _fake_model_jnp(x, t, context, mask):
    if mask is None:
        mask = jnp.zeros((x.shape[0], 1), x.dtype)
    ctx_eff = context * (1.0 - mask)
    return 0.1 * x + 0.05 * jnp.sum(ctx_eff, axis=-1, keepdims=True)[:, None, :] * jnp.ones_like(x)


def _oracle_cfg_step(tb, x, i, noise, context, w):
    """Verbatim ddpm_cart_pole_sample_fn + p_mean_variance_CFG (fp64)."""
    t = max(i, 0)
    eps_c = _fake_model(x, t, context, np.zeros((B, 1)))
    eps_u = _fake_model(x, t, context, np.ones((B, 1)))
    rc = tb["sqrt_recip_alphas_cumprod"][t] * x - tb["sqrt_recipm1_alphas_cumprod"][t] * eps_c
    ru = tb["sqrt_recip_alphas_cumprod"][t] * x - tb["sqrt_recipm1_alphas_cumprod"][t] * eps_u
    x_recon = np.clip((1 + w) * rc - w * ru, -1, 1)
    mean = tb["posterior_mean_coef1"][t] * x_recon + tb["posterior_mean_coef2"][t] * x
    log_var = tb["posterior_log_variance_clipped"][t]
    n = noise.copy()
    if t == 0:  # reference zeroes noise where t == 0 (incl. clamped tails)
        n[:] = 0
    return mean + np.sqrt(np.exp(log_var)) * n


@pytest.fixture(scope="module")
def diff():
    return GaussianDiffusion(schedule=make_schedule("exponential", T), predict_epsilon=True)


@pytest.mark.parametrize("i", [24, 12, 5, 1, 0, -1, -5])
def test_cfg_step_matches_oracle(diff, i):
    tb = _tables()
    rng = np.random.RandomState(42 + i)
    x = rng.randn(B, H, D)
    noise = rng.randn(B, H, D)
    ctx = rng.randn(B, 5)
    want = _oracle_cfg_step(tb, x, i, noise, ctx, W_CFG)
    got = diff.ddpm_cfg_step(
        _fake_model_jnp,
        jnp.asarray(x, jnp.float32),
        jnp.int32(i),
        jnp.asarray(noise, jnp.float32),
        jnp.asarray(ctx, jnp.float32),
        W_CFG,
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_cfg_trajectory_matches_oracle(diff):
    """Full 25+5-step chain with identical injected noise per step."""
    tb = _tables()
    rng = np.random.RandomState(7)
    x = rng.randn(B, H, D)
    ctx = rng.randn(B, 5)
    noises = rng.randn(T + 5, B, H, D)

    x_oracle = x.copy()
    x_jax = jnp.asarray(x, jnp.float32)
    for step_idx, i in enumerate(range(T - 1, -6, -1)):
        x_oracle = _oracle_cfg_step(tb, x_oracle, i, noises[step_idx], ctx, W_CFG)
        x_jax = diff.ddpm_cfg_step(
            _fake_model_jnp, x_jax, jnp.int32(i),
            jnp.asarray(noises[step_idx], jnp.float32),
            jnp.asarray(ctx, jnp.float32), W_CFG,
        )
    np.testing.assert_allclose(np.asarray(x_jax), x_oracle, rtol=1e-3, atol=1e-4)


def test_q_sample_matches_oracle(diff):
    tb = _tables()
    rng = np.random.RandomState(3)
    x0 = rng.randn(B, H, D)
    noise = rng.randn(B, H, D)
    t = np.array([4, 20])
    want = (
        tb["sqrt_alphas_cumprod"][t][:, None, None] * x0
        + tb["sqrt_one_minus_alphas_cumprod"][t][:, None, None] * noise
    )
    got = diff.q_sample(jnp.asarray(x0, jnp.float32), jnp.asarray(t), jnp.asarray(noise, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cfg_sample_loop_runs_and_matches_stepwise(diff):
    """The lax.scan CFG sampler equals manually iterating ddpm_cfg_step with
    the same key schedule."""
    key = jax.random.PRNGKey(0)
    ctx = jnp.ones((B, 5)) * 0.3
    x_final, chain = diff.ddpm_cfg_sample(
        _fake_model_jnp, (B, H, D), key, ctx, w=W_CFG,
        n_diffusion_steps_without_noise=5, return_chain=True,
    )
    assert chain.shape == (T + 5 + 1, B, H, D)
    np.testing.assert_allclose(chain[-1], x_final, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(x_final)))
    # samples land in the clipped data range (plus tiny posterior noise slack)
    assert float(jnp.max(jnp.abs(x_final))) < 1.5
    # deterministic tail: last 5 transitions used zero noise -> x drifts only
    # via the posterior mean; final two entries nearly equal
    np.testing.assert_allclose(chain[-1], chain[-2], rtol=0, atol=5e-2)


def test_cfg_sample_reproducible(diff):
    key = jax.random.PRNGKey(123)
    ctx = jnp.zeros((B, 5))
    a = diff.ddpm_cfg_sample(_fake_model_jnp, (B, H, D), key, ctx, w=W_CFG)
    b = diff.ddpm_cfg_sample(_fake_model_jnp, (B, H, D), key, ctx, w=W_CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_w0_equals_conditional_only(diff):
    """w=0 must reduce to the pure conditional model (property test from
    SURVEY.md §4c)."""
    key = jax.random.PRNGKey(5)
    ctx = jnp.ones((B, 5)) * 0.2
    a = diff.ddpm_cfg_sample(_fake_model_jnp, (B, H, D), key, ctx, w=0.0)

    def cond_only(x, t, context, mask):
        return _fake_model_jnp(x, t, context, jnp.zeros((x.shape[0], 1)))

    # plain ddpm with the conditional model and same key
    b = diff.ddpm_sample(cond_only, (B, H, D), key, context=ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_hard_conditioning():
    x = jnp.zeros((3, 8, 2))
    idx = jnp.array([0, 7])
    vals = jnp.ones((3, 2, 2)) * 5.0
    out = apply_hard_conds(x, (idx, vals))
    np.testing.assert_allclose(out[:, 0, :], 5.0)
    np.testing.assert_allclose(out[:, 7, :], 5.0)
    np.testing.assert_allclose(out[:, 1:7, :], 0.0)


def test_ddpm_sample_with_hard_conds_and_guide(diff):
    key = jax.random.PRNGKey(9)
    idx = jnp.array([0])
    vals = jnp.full((B, 1, D), 0.25)

    def guide(x):
        return -0.01 * x  # pull towards zero

    x = diff.ddpm_sample(
        _fake_model_jnp, (B, H, D), key, context=jnp.zeros((B, 5)),
        hard_conds=(idx, vals), guide=guide, t_start_guide=10,
        n_diffusion_steps_without_noise=2,
    )
    np.testing.assert_allclose(np.asarray(x)[:, 0, :], 0.25, rtol=1e-6)


def test_ddim_sample_shapes(diff):
    key = jax.random.PRNGKey(11)
    x, chain = diff.ddim_sample(
        _fake_model_jnp, (B, H, D), key, context=jnp.zeros((B, 5)), return_chain=True,
    )
    assert x.shape == (B, H, D)
    assert np.all(np.isfinite(np.asarray(x)))
    # T//5 = 5 sampling steps + initial; chain length = pairs+1 (loop breaks at
    # time_next < 0)
    assert chain.shape[0] >= 3


def test_loss_finite_and_mask_used(diff):
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (16, H, D))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (16, 5))
    loss = diff.loss(_fake_model_jnp, x0, ctx, key)
    assert np.isfinite(float(loss))


def test_loss_jits(diff):
    f = jax.jit(lambda x0, ctx, key: diff.loss(_fake_model_jnp, x0, ctx, key))
    out = f(jnp.ones((4, H, D)), jnp.ones((4, 5)), jax.random.PRNGKey(0))
    assert np.isfinite(float(out))


def test_ddim_cfg_w0_matches_unguided(diff):
    """w=0 must be bit-identical to the unguided conditional DDIM pass."""
    key = jax.random.PRNGKey(12)
    ctx = jnp.ones((B, 5)) * 0.3
    x_unguided = diff.ddim_sample(_fake_model_jnp, (B, H, D), key, context=ctx)
    x_w0 = diff.ddim_sample(_fake_model_jnp, (B, H, D), key, context=ctx, w=0.0)
    np.testing.assert_array_equal(np.asarray(x_unguided), np.asarray(x_w0))


def test_ddim_cfg_guides_toward_context(diff):
    """CFG-DDIM with w > 0: (a) differs from the unguided pass when the
    denoiser uses context, (b) is identical for a context-blind denoiser
    (the CFG combination collapses when cond == uncond output)."""
    key = jax.random.PRNGKey(13)
    ctx = jnp.ones((B, 5)) * 0.5
    x0 = diff.ddim_sample(_fake_model_jnp, (B, H, D), key, context=ctx, w=0.0)
    x2 = diff.ddim_sample(_fake_model_jnp, (B, H, D), key, context=ctx, w=2.0)
    assert float(jnp.max(jnp.abs(x0 - x2))) > 1e-6

    blind = lambda x, t, c, m: 0.1 * x
    y0 = diff.ddim_sample(blind, (B, H, D), key, context=ctx, w=0.0)
    y2 = diff.ddim_sample(blind, (B, H, D), key, context=ctx, w=2.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2), rtol=1e-5, atol=1e-6)
