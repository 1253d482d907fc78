"""Pipeline-parallel denoising chain parity: `parallel/pp_chain.py` must
reproduce `GaussianDiffusion.ddpm_cfg_sample` per request, exactly, for any
pipeline depth that divides the chain — including fill/drain bubbles
(R < S, R == 1) and the guided path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.parallel.pp_chain import make_pp_cfg_sampler


def _setup(n_steps=8, tail=0):
    model = TemporalUnet(
        state_dim=1, n_support_points=16, unet_input_dim=16,
        dim_mults=(1, 2), context_dim=3, conditioning_type="default",
    )
    diffusion = GaussianDiffusion(schedule=make_schedule("exponential", n_steps))
    B = 4
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2 * B, 16, 1), jnp.float32),
        jnp.zeros((2 * B,), jnp.int32),
        jnp.zeros((2 * B, 3), jnp.float32),
        jnp.zeros((2 * B, 1), jnp.float32),
    )
    denoise = lambda x, t, c, mk: model.apply(params, x, t, c, mk)
    return diffusion, denoise, (B, 16, 1)


def _pp_mesh(S):
    devs = jax.devices()
    if len(devs) < S:
        pytest.skip(f"needs {S} devices")
    return Mesh(np.array(devs[:S]), axis_names=("pp",))


def _requests(R, shape, seed=7):
    rng = np.random.RandomState(seed)
    contexts = jnp.asarray(rng.randn(R, shape[0], 3), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(100, 100 + R))
    return contexts, keys


def _sequential(diffusion, denoise, shape, contexts, keys, tail=0, **kw):
    outs = [
        diffusion.ddpm_cfg_sample(
            denoise, shape, keys[r], contexts[r], w=0.01,
            n_diffusion_steps_without_noise=tail, **kw,
        )
        for r in range(contexts.shape[0])
    ]
    return jnp.stack(outs)


@pytest.mark.parametrize("S,R", [(4, 6), (8, 3), (2, 1)])
def test_pp_matches_sequential(S, R):
    """R requests through an S-stage pipeline == R sequential chains,
    covering steady state (R > S), mostly-bubble (R < S), and a single
    request (pure fill/drain)."""
    mesh = _pp_mesh(S)
    diffusion, denoise, shape = _setup(n_steps=8)
    contexts, keys = _requests(R, shape)

    sampler = make_pp_cfg_sampler(mesh, diffusion, denoise, shape, w=0.01)
    got = sampler(contexts, keys)
    ref = _sequential(diffusion, denoise, shape, contexts, keys)

    assert got.shape == (R,) + shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_with_tail_and_guide():
    """The no-noise tail extends the chain (8 + 4 = 12 steps over 4 stages)
    and the cost-gradient guide composes with CFG inside the pipeline."""
    mesh = _pp_mesh(4)
    diffusion, denoise, shape = _setup(n_steps=8)
    contexts, keys = _requests(5, shape, seed=11)

    guide = lambda x: -0.01 * x  # pull-to-origin quadratic-cost gradient
    kw = dict(guide=guide, n_guide_steps=2, t_start_guide=6.0)
    sampler = make_pp_cfg_sampler(
        mesh, diffusion, denoise, shape, w=0.01,
        n_diffusion_steps_without_noise=4, **kw,
    )
    got = sampler(contexts, keys)
    ref = _sequential(diffusion, denoise, shape, contexts, keys, tail=4, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_rejects_indivisible_depth():
    mesh = _pp_mesh(4)
    diffusion, denoise, shape = _setup(n_steps=7)
    with pytest.raises(ValueError, match="divisible"):
        make_pp_cfg_sampler(mesh, diffusion, denoise, shape)
