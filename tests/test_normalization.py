"""Normalizer semantics vs the reference's LimitsNormalizer family."""
import numpy as np
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.data.normalization import (
    DatasetNormalizer,
    canonical_kind,
    fit_normalizer,
    normalize,
    unnormalize,
)


def test_limits_round_trip():
    rng = np.random.RandomState(0)
    x = rng.uniform(-3, 7, size=(100, 4)).astype(np.float32)
    stats = fit_normalizer(x, "limits")
    z = normalize(stats, jnp.asarray(x))
    assert float(jnp.min(z)) >= -1.0 - 1e-6
    assert float(jnp.max(z)) <= 1.0 + 1e-6
    back = unnormalize(stats, z)
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_limits_fit_flattens_bhd():
    """Stats computed over (b*h, d), reference normalization.py:58-78."""
    rng = np.random.RandomState(1)
    x = rng.uniform(-2, 2, size=(10, 8, 3)).astype(np.float32)
    stats = fit_normalizer(x, "limits")
    np.testing.assert_allclose(stats.mins, x.reshape(-1, 3).min(0))
    np.testing.assert_allclose(stats.maxs, x.reshape(-1, 3).max(0))


def test_unnormalize_clips_out_of_range():
    """Reference normalization.py:156-167: out-of-range samples clip to the
    data limits."""
    x = np.array([[0.0, 0.0], [10.0, 4.0]], dtype=np.float32)
    stats = fit_normalizer(x, "limits")
    out = unnormalize(stats, jnp.array([[2.0, -5.0]]))
    np.testing.assert_allclose(out[0], [10.0, 0.0], rtol=1e-6)


def test_gaussian_uses_bessel_std():
    rng = np.random.RandomState(2)
    x = rng.normal(3.0, 2.0, size=(50, 2)).astype(np.float32)
    stats = fit_normalizer(x, "gaussian")
    np.testing.assert_allclose(stats.stds, x.std(0, ddof=1), rtol=1e-5)
    z = normalize(stats, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z).mean(0), 0.0, atol=1e-5)
    back = unnormalize(stats, z)
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_safe_limits_pads_constant_dims():
    x = np.array([[1.0, 5.0], [2.0, 5.0]], dtype=np.float32)  # dim 1 constant
    stats = fit_normalizer(x, "safe_limits", eps=1.0)
    # reference pads the WHOLE vector per constant dim
    np.testing.assert_allclose(stats.mins, [0.0, 4.0])
    np.testing.assert_allclose(stats.maxs, [3.0, 6.0])
    z = normalize(stats, jnp.asarray(x))
    assert np.all(np.isfinite(z))


def test_dataset_normalizer_multi_field():
    rng = np.random.RandomState(3)
    fields = {
        "inputs": rng.uniform(-2, 2, size=(20, 8, 1)).astype(np.float32),
        "condition": rng.uniform(-1, 1, size=(20, 5)).astype(np.float32),
    }
    dn = DatasetNormalizer.fit(fields, kind="LimitsNormalizer")
    z = dn.normalize(jnp.asarray(fields["inputs"]), "inputs")
    assert z.shape == (20, 8, 1)
    back = dn.unnormalize(z, "inputs")
    np.testing.assert_allclose(back, fields["inputs"], rtol=1e-4, atol=1e-4)


def test_canonical_kind_accepts_reference_names():
    assert canonical_kind("LimitsNormalizer") == "limits"
    assert canonical_kind("GaussianNormalizer") == "gaussian"
    assert canonical_kind("limits") == "limits"


def test_normalizer_is_jittable():
    import jax

    x = np.random.RandomState(4).uniform(-1, 1, (10, 3)).astype(np.float32)
    stats = fit_normalizer(x, "limits")

    @jax.jit
    def f(s, v):
        return unnormalize(s, normalize(s, v))

    out = f(stats, jnp.asarray(x))
    np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-4)
