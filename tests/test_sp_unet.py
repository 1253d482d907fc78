"""Sequence-parallel U-Net parity: `parallel/sp_unet.py` (horizon sharded,
halo-exchange convs, polyphase transpose conv, psum'd GroupNorm stats) must
match the unsharded flax forward numerically on every supported mesh shape,
including the flagship 3-level config and a hybrid (data, seq) mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.parallel.sp_unet import make_sp_unet_apply


def _mesh(shape, names):
    devs = jax.devices()
    n = int(np.prod(shape))
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]).reshape(shape), axis_names=names)


def _build(H=32, state_dim=2, dim_mults=(1, 2), context_dim=3, seed=0):
    model = TemporalUnet(
        state_dim=state_dim, n_support_points=H, unet_input_dim=16,
        dim_mults=dim_mults, context_dim=context_dim,
        conditioning_type="default",
    )
    rng = np.random.RandomState(seed)
    B = 3
    x = jnp.asarray(rng.randn(B, H, state_dim), jnp.float32)
    t = jnp.asarray(rng.randint(0, 20, (B,)), jnp.int32)
    ctx = jnp.asarray(rng.randn(B, context_dim), jnp.float32)
    mask = jnp.asarray(rng.rand(B, 1) < 0.3, jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x, t, ctx, mask)
    return model, params, (x, t, ctx, mask)


@pytest.mark.parametrize("S", [2, 4, 8])
def test_sp_matches_unsharded(S):
    mesh = _mesh((S,), ("seq",))
    model, params, (x, t, ctx, mask) = _build(H=32)
    ref = model.apply(params, x, t, ctx, mask)
    sp = make_sp_unet_apply(mesh, model, params)
    got = sp(x, t, ctx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_three_level_flagship_shape():
    """The flagship 3-level (1,2,4) config: deepest level H/4 must still
    shard (H=64, S=4 -> 4 rows/device at the bottom)."""
    mesh = _mesh((4,), ("seq",))
    model, params, (x, t, ctx, mask) = _build(H=64, dim_mults=(1, 2, 4),
                                              seed=2)
    ref = model.apply(params, x, t, ctx, mask)
    got = make_sp_unet_apply(mesh, model, params)(x, t, ctx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_hybrid_data_seq_mesh():
    """SP composes with DP: (data 2, seq 4) hybrid — SP only touches its
    own axis, 'data' stays free for batch sharding at the call site."""
    mesh = _mesh((2, 4), ("data", "seq"))
    model, params, (x, t, ctx, mask) = _build(H=32, seed=3)
    ref = model.apply(params, x, t, ctx, mask)
    got = make_sp_unet_apply(mesh, model, params)(x, t, ctx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_unconditioned_model():
    mesh = _mesh((4,), ("seq",))
    model = TemporalUnet(
        state_dim=1, n_support_points=32, unet_input_dim=16,
        dim_mults=(1, 2), context_dim=0, conditioning_type=None,
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 32, 1), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(5), x, t)
    ref = model.apply(params, x, t)
    got = make_sp_unet_apply(mesh, model, params)(x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_rejects_bad_mesh():
    mesh = _mesh((8,), ("seq",))
    model, params, _ = _build(H=32, dim_mults=(1, 2, 4))
    # deepest level H/4 = 8 -> 1 row/device over 8 shards: rejected
    with pytest.raises(ValueError, match="deepest"):
        make_sp_unet_apply(mesh, model, params)
