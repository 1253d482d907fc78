"""Dataset containers and expert data generation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset, train_val_split
from mpc_via_diffusion_model_tpu.data.generation import (
    collect_closed_loop_dataset,
    collect_lmpc_dataset,
    make_initial_state_grid,
)
from mpc_via_diffusion_model_tpu.dynamics import (
    cartpole_lmpc,
    cartpole_lmpc_cost,
    double_integrator,
    double_integrator_cost,
    theta_to_red_theta,
)


def test_dataset_from_arrays_and_batch():
    rng = np.random.RandomState(0)
    ds = ControlSequenceDataset.from_arrays(
        rng.uniform(-3, 3, (50, 8, 1)), rng.uniform(-1, 1, (50, 4))
    )
    assert ds.n_init == 50 and ds.n_support_points == 8 and ds.state_dim == 1
    assert ds.condition_dim == 4
    # normalized fields in [-1, 1]
    assert float(jnp.max(jnp.abs(ds.inputs_normalized))) <= 1.0 + 1e-5
    inputs, cond = ds.batch(jax.random.PRNGKey(0), 16)
    assert inputs.shape == (16, 8, 1) and cond.shape == (16, 4)

    # normalize/unnormalize API names match the reference
    x0 = jnp.asarray(np.asarray(ds.condition)[0])
    z = ds.normalize_condition(x0)
    u = ds.unnormalize_states(inputs)
    assert z.shape == (4,) and u.shape == (16, 8, 1)


def test_dataset_npz_round_trip(tmp_path):
    rng = np.random.RandomState(1)
    ds = ControlSequenceDataset.from_arrays(rng.randn(10, 4, 1), rng.randn(10, 2))
    p = str(tmp_path / "ds.npz")
    ds.save(p)
    ds2 = ControlSequenceDataset.load(p)
    np.testing.assert_allclose(np.asarray(ds.inputs), np.asarray(ds2.inputs))


def test_train_val_split():
    tr, va = train_val_split(100, 0.05, seed=0)
    assert len(tr) == 95 and len(va) == 5
    assert set(tr) | set(va) == set(range(100))


def test_initial_state_grid():
    grid = make_initial_state_grid(
        np.linspace(-1, 1, 3), np.linspace(2.4, 3.9, 4), state_dim=5,
        theta_to_virtual=lambda t: float(theta_to_red_theta(t)),
    )
    assert grid.shape == (12, 5)
    assert np.allclose(grid[:, 1], 0) and np.allclose(grid[:, 3], 0)
    assert np.all(grid[:, 4] != 0)


def test_collect_lmpc_dataset():
    plant = cartpole_lmpc()
    cost = cartpole_lmpc_cost()
    n = 4
    a = jnp.asarray(
        np.stack([np.asarray(plant.step(jnp.eye(n)[i], jnp.zeros(1))) for i in range(n)], axis=1)
    )
    b = jnp.asarray(np.asarray(plant.step(jnp.zeros(n), jnp.ones(1)))[:, None])
    q, r, p = jnp.diag(cost.q_diag), jnp.array([[1.0]]), jnp.diag(cost.p_diag)
    grid = make_initial_state_grid(np.linspace(-1, 1, 3), np.linspace(2.4, 3.9, 3), state_dim=4)
    ds = collect_lmpc_dataset(a, b, q, r, p, grid, horizon=8,
                              noise_std=0.1, n_noisy=2, key=jax.random.PRNGKey(0))
    assert ds.n_init == 9 * 3  # grid + 2 noisy replicas each
    assert ds.inputs.shape == (27, 8, 1)
    assert np.all(np.isfinite(np.asarray(ds.inputs)))


def test_collect_closed_loop_dataset_small():
    """Tiny closed-loop collection on the double integrator (fast, convex)."""
    plant = double_integrator()
    cost = double_integrator_cost()
    grid = np.array([[1.0, 0.0], [-1.0, 0.5]], dtype=np.float32)
    u, x, j = collect_closed_loop_dataset(
        plant, cost, grid, horizon=8, n_control_steps=5, solver_iterations=8,
        u_kick_scales=(0.0,), noise_std=0.05, n_noisy=2,
        key=jax.random.PRNGKey(0), return_arrays=True,
    )
    # 2 grid x 1 kick x 5 steps x (1 nominal + 2 noisy) = 30
    assert u.shape == (30, 8, 1)
    assert x.shape == (30, 2)
    assert j.shape == (30,)
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(j))

    ds = collect_closed_loop_dataset(
        plant, cost, grid, horizon=8, n_control_steps=3, solver_iterations=5,
        u_kick_scales=(0.0,), n_noisy=0, key=jax.random.PRNGKey(0),
    )
    assert ds.n_init == 6


def test_acrobot_grid_and_collection_smoke():
    """Acrobot workload (reference Acrobots/acrobots_nmpc.py): grid + a tiny
    on-device closed-loop collection."""
    from mpc_via_diffusion_model_tpu.data.generation import make_acrobot_grid
    from mpc_via_diffusion_model_tpu.dynamics import acrobot, acrobot_cost

    grid = make_acrobot_grid(np.linspace(-np.pi / 2, np.pi / 2, 2),
                             np.linspace(-np.pi / 2, np.pi / 2, 2))
    assert grid.shape == (4, 6)
    plant, cost = acrobot(), acrobot_cost()
    u, x, j = collect_closed_loop_dataset(
        plant, cost, grid, horizon=8, n_control_steps=3, solver_iterations=5,
        u_kick_scales=(40.0, -40.0), n_noisy=0, key=jax.random.PRNGKey(0),
        return_arrays=True,
    )
    assert u.shape[0] == 4 * 2 * 3
    assert np.all(np.isfinite(u))


def test_gaussian_normalizer_constant_dim_no_nan():
    """A constant dim must not divide by zero under 'gaussian' (ADVICE r1)."""
    from mpc_via_diffusion_model_tpu.data.normalization import fit_normalizer, normalize

    x = np.stack([np.linspace(0, 1, 10), np.full(10, 3.0)], axis=1).astype(np.float32)
    stats = fit_normalizer(x, kind="gaussian")
    out = np.asarray(normalize(stats, jnp.asarray(x)))
    assert np.all(np.isfinite(out))


def test_specified_split_unequal_ranges_raise():
    from mpc_via_diffusion_model_tpu.data.datasets import specified_split

    with pytest.raises(ValueError):
        specified_split(range(0, 10), range(10, 15), range(20, 30), range(30, 40))


def test_reference_lmpc_regeneration_matches_committed_tensor():
    """The 180k recipe regeneration must reproduce the committed x0 tensor
    bit-faithfully (fp32 storage roundoff only)."""
    import os
    ref_path = "/root/reference/training_data/CartPole-LMPC/x0_tensor_180000-4.pt"
    if not os.path.exists(ref_path):
        pytest.skip("reference tensors not mounted")
    import torch
    from mpc_via_diffusion_model_tpu.data.reference_lmpc import (
        regenerate_reference_lmpc_arrays,
    )

    u, x = regenerate_reference_lmpc_arrays(n_pos=15, n_theta=15, n_noisy=15)
    assert u.shape == (180000, 8, 1) and x.shape == (180000, 4)
    ref = torch.load(ref_path, map_location="cpu").numpy()
    np.testing.assert_allclose(x, ref, atol=5e-7)


def test_reference_lmpc_x0_recovery():
    """The recovered x0s reproduce the committed u_mpc tracks to all 4
    stored decimals through the exact MPC loop."""
    import os
    base = "/root/reference/model_performance_saving/model_230000"
    if not os.path.exists(base):
        pytest.skip("reference artifacts not mounted")
    from mpc_via_diffusion_model_tpu.data.reference_lmpc import (
        REFERENCE_X0_101, REFERENCE_X0_14, lmpc_lqr_gain_maps,
    )

    a_d, b_d, g = lmpc_lqr_gain_maps()
    for tag, x0 in (("x0_101", REFERENCE_X0_101), ("x0_14", REFERENCE_X0_14)):
        um = np.load(f"{base}/{tag}/u_mpc.npy")[0]
        x = x0.copy()
        us = []
        for _ in range(um.shape[0]):
            u = (g @ x)[0]
            us.append(u)
            x = a_d @ x + b_d[:, 0] * u
        np.testing.assert_allclose(np.round(us, 4), um, atol=1e-9)
