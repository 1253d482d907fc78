"""Megatron-style TP over the 'model' mesh axis: numeric parity vs the
unsharded AMPC MLP (column/row-parallel Dense + psum + tiled all_gather)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mpc_via_diffusion_model_tpu.models.ampc import AMPCNet
from mpc_via_diffusion_model_tpu.parallel.tensor_parallel import make_tp_ampc_apply


@pytest.mark.parametrize("m", [2, 5])
def test_tp_ampc_matches_unsharded(m):
    devs = jax.devices()
    if len(devs) < m:
        pytest.skip(f"needs {m} devices")
    mesh = Mesh(np.array(devs[:m]), axis_names=("model",))

    model = AMPCNet(horizon=20, control_dim=1)
    x = jnp.asarray(np.random.RandomState(0).randn(6, 5).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)

    tp = make_tp_ampc_apply(mesh, params)
    out = tp(x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tp_hybrid_mesh_model_axis():
    """TP composes with a 2-D ('data', 'model') hybrid mesh — the 'model'
    axis of a (4, 2) mesh serves the sharded forward."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(4, 2), axis_names=("data", "model"))

    model = AMPCNet(horizon=16, control_dim=1)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 5).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)
    ref = model.apply(params, x)
    out = make_tp_ampc_apply(mesh, params)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
