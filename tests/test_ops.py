"""Pallas fused conv kernel vs the flax layers it replaces.

On the CPU test backend the fused op IS the XLA reference path; the test
therefore checks (a) the reference path matches flax's Conv1dBlock exactly
(same math), and (b) the pre_bias fusion matches the ResidualTemporalBlock
composition. The Pallas TPU path is checked on-device by
`scripts/bench_kernels.py` (numerics + speed), since the test mesh is CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.models.layers import Conv1dBlock, group_norm_n_groups
from mpc_via_diffusion_model_tpu.ops import conv1d_gn_mish_reference, fused_conv1d_gn_mish


def _flax_params_to_kernel(params):
    conv = params["params"]["Conv_0"]
    gn = params["params"]["GroupNorm_0"]
    return (
        jnp.asarray(conv["kernel"]),  # (5, Cin, Cout)
        jnp.asarray(conv["bias"]),
        jnp.asarray(gn["scale"]),
        jnp.asarray(gn["bias"]),
    )


@pytest.mark.parametrize("bsz,h,cin,cout", [(2, 32, 1, 32), (4, 16, 32, 64), (2, 8, 64, 128)])
def test_reference_matches_flax_conv1dblock(bsz, h, cin, cout):
    block = Conv1dBlock(cout, 5, group_norm_n_groups(cout))
    x = jax.random.normal(jax.random.PRNGKey(0), (bsz, h, cin))
    params = block.init(jax.random.PRNGKey(1), x)
    want = block.apply(params, x)

    w, b, gamma, beta = _flax_params_to_kernel(params)
    got = conv1d_gn_mish_reference(x, w, b, gamma, beta, group_norm_n_groups(cout))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_dispatches_to_reference_on_cpu():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (5, 8, 16)) * 0.1
    b = jnp.zeros((16,))
    gamma, beta = jnp.ones((16,)), jnp.zeros((16,))
    got = fused_conv1d_gn_mish(x, w, b, gamma, beta, 8)
    want = conv1d_gn_mish_reference(x, w, b, gamma, beta, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pre_bias_fusion_matches_sequential():
    """pre_bias fuses `h + cond` into the next block's load."""
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 16))
    cond = jax.random.normal(jax.random.PRNGKey(3), (3, 16))
    w = jax.random.normal(jax.random.PRNGKey(4), (5, 16, 16)) * 0.1
    b = jnp.zeros((16,))
    gamma, beta = jnp.ones((16,)), jnp.zeros((16,))
    got = fused_conv1d_gn_mish(x, w, b, gamma, beta, 8, pre_bias=cond)
    want = conv1d_gn_mish_reference(x + cond[:, None, :], w, b, gamma, beta, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
