"""Schedule tables vs a line-by-line numpy oracle of the reference math."""
import numpy as np
import pytest

from mpc_via_diffusion_model_tpu.core.schedules import (
    BETA_SCHEDULES,
    exponential_beta_schedule,
    cosine_beta_schedule,
    make_schedule,
)


def _oracle_exponential(n, beta_start=1e-4, beta_end=1.0):
    # verbatim reference helpers.py:40-46 in numpy
    x = np.linspace(0, n, n)
    a = 1 / n * np.log(beta_end / beta_start)
    return beta_start * np.exp(a * x)


def test_exponential_matches_reference_formula():
    got = exponential_beta_schedule(25)
    want = _oracle_exponential(25)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got[0] == pytest.approx(1e-4)
    assert got[-1] == pytest.approx(1.0)


def test_cosine_matches_reference_formula():
    n, s = 20, 0.008
    steps = n + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    want = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    np.testing.assert_allclose(cosine_beta_schedule(n), want, rtol=1e-10)


@pytest.mark.parametrize("name", sorted(BETA_SCHEDULES))
def test_all_schedules_are_valid(name):
    betas = BETA_SCHEDULES[name](25)
    assert betas.shape == (25,)
    if name != "variance_preserving":
        # the reference's variance_preserving formula yields a negative first
        # beta at T=25 (helpers.py:55-62, "works only with a small number of
        # diffusion steps"); preserved verbatim, excluded from positivity.
        assert np.all(betas > 0)
    assert np.all(betas <= 1.0 + 1e-12)


def test_derived_tables_match_oracle():
    sched = make_schedule("exponential", 25)
    betas = _oracle_exponential(25)
    alphas_cumprod = np.maximum(np.cumprod(1 - betas), 1e-12)
    prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    post_var = betas * (1 - prev) / (1 - alphas_cumprod)

    np.testing.assert_allclose(sched.betas, betas, rtol=1e-6)
    np.testing.assert_allclose(sched.alphas_cumprod, alphas_cumprod, rtol=1e-5)
    np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=1e-5)
    np.testing.assert_allclose(
        sched.posterior_mean_coef1, betas * np.sqrt(prev) / (1 - alphas_cumprod), rtol=1e-5
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef2,
        (1 - prev) * np.sqrt(np.maximum(1 - betas, 0)) / (1 - alphas_cumprod),
        rtol=1e-5,
    )
    assert np.all(np.isfinite(np.asarray(sched.posterior_mean_coef2)))
    # all tables finite (the fp32 torch version can produce inf here)
    for field in (
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_log_variance_clipped",
    ):
        assert np.all(np.isfinite(np.asarray(getattr(sched, field)))), field


def test_extract_broadcasts():
    import jax.numpy as jnp

    sched = make_schedule("exponential", 25)
    t = jnp.array([0, 5, 24])
    out = sched.extract(sched.betas, t, ndim=3)
    assert out.shape == (3, 1, 1)
    np.testing.assert_allclose(out[:, 0, 0], np.asarray(sched.betas)[[0, 5, 24]])
