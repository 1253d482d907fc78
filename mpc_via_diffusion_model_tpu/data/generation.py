"""Expert dataset generation: batched on-device OCP solves.

Replaces the reference's data-collection scripts:
- `cart_pole_lmpc_collecting.py` / `6400_data_collecting.py`: open-loop LQR
  solves over an initial-state grid.
- `noisy_data_collecting.py:12-30`: N(0, 0.15^2) noisy replicas per state.
- `nmpc_multi_process_collect_data.py`: `multiprocessing.Pool(30)` over
  (2 initial guesses x 200 initial states), each an 80-step closed loop with
  one horizon-64 IPOPT solve for the nominal state + 20 noisy states per
  step (672 000 solves total) — here ONE jitted program: vmap over
  (guesses x grid), `lax.scan` over control steps, vmap again over noisy
  replicas; every solve is an iLQR warm-started from the previous shifted
  solution.

Output matches the reference's tensor layout (`u` (N, H, du), `x0` (N, dx),
`J` (N,)) so `ControlSequenceDataset.from_arrays` consumes it directly.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.base import Plant, QuadraticCost
from ..solvers.ilqr import ILQRConfig, ilqr_solve
from ..solvers.lqr import lqr_solve
from .datasets import ControlSequenceDataset

__all__ = [
    "make_initial_state_grid",
    "collect_lmpc_dataset",
    "collect_closed_loop_dataset",
]


def make_initial_state_grid(pos_range, theta_range, state_dim: int = 4, theta_to_virtual=None) -> np.ndarray:
    """(pos x theta) grid of initial states, zeros elsewhere — the reference's
    rng0 construction (`Diffusion_MPC_Inference.py:153-174`,
    `nmpc_multi_process_collect_data.py:345-361`)."""
    out = []
    for p in np.asarray(pos_range):
        for t in np.asarray(theta_range):
            x0 = np.zeros(state_dim, dtype=np.float32)
            x0[0] = p
            x0[2] = t
            if theta_to_virtual is not None and state_dim >= 5:
                x0[4] = theta_to_virtual(t)
            out.append(x0)
    return np.stack(out)


def collect_lmpc_dataset(
    a: jnp.ndarray,
    b: jnp.ndarray,
    q: jnp.ndarray,
    r: jnp.ndarray,
    p: jnp.ndarray,
    x0_grid: np.ndarray,
    horizon: int,
    noise_std: float = 0.0,
    n_noisy: int = 0,
    key: Optional[jax.Array] = None,
    normalizer: str = "LimitsNormalizer",
) -> ControlSequenceDataset:
    """Open-loop LQR expert over a grid (+ optional noisy replicas), one-shot
    (reference `cart_pole_lmpc_collecting.py:80-239`,
    `noisy_data_collecting.py:12-30`)."""
    x0s = jnp.asarray(x0_grid, jnp.float32)
    if n_noisy > 0:
        assert key is not None
        noise = jax.random.normal(key, (n_noisy,) + x0s.shape) * noise_std
        x0s = jnp.concatenate([x0s, (x0s[None] + noise).reshape(-1, x0s.shape[-1])], axis=0)

    solve = jax.jit(jax.vmap(lambda x0: lqr_solve(a, b, q, r, p, x0, horizon)))
    sol = solve(x0s)
    return ControlSequenceDataset.from_arrays(
        np.asarray(sol.us), np.asarray(x0s), normalizer=normalizer
    )


def collect_closed_loop_dataset(
    plant: Plant,
    cost: QuadraticCost,
    x0_grid: np.ndarray,
    horizon: int = 64,
    n_control_steps: int = 80,
    solver_iterations: int = 30,
    u_kick_scales: Tuple[float, ...] = (5.0, -5.0),
    noise_std: float = 0.15,
    n_noisy: int = 20,
    key: Optional[jax.Array] = None,
    normalizer: str = "LimitsNormalizer",
    return_arrays: bool = False,
    state_to_condition=None,
    cold_start: bool = False,
):
    """Closed-loop expert data collection, fully on device.

    ``state_to_condition`` maps recorded plant states to the conditioning
    vectors stored in the dataset (identity by default; e.g. the Panda
    20-dim context, `dynamics.panda_context`).

    For every (x0 in grid) x (kick in u_kick_scales): run ``n_control_steps``
    of receding-horizon iLQR (warm-started from the shifted previous
    solution); at each step also solve from ``n_noisy`` Gaussian-perturbed
    copies of the current state (cold-started from the nominal warm start).
    Records (state, u-horizon, cost) for nominal and noisy solves — the exact
    data layout of `nmpc_multi_process_collect_data.py:196-318`.

    ``cold_start=True`` reproduces the reference collector's actual protocol:
    EVERY solve (nominal and noisy, at every control step) starts from the
    group's constant +/-kick guess rather than the shifted previous solution
    (`nmpc_multi_process_collect_data.py:143-153,234,260-272` passes the
    group's ``x_ini_guess, u_ini_guess`` to each ``MPC_Solve``). This keeps
    each group committed to its swing basin for the whole run, so states the
    two groups both visit (the start cloud, the near-target region) carry
    BOTH basin labels — the training-data overlap the one-state
    multi-modality study (`Cart_Diffusion_inference.py:405-510`) relies on.

    Total samples = len(grid) * len(kicks) * n_control_steps * (1 + n_noisy).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    cfg = ILQRConfig(horizon=horizon, n_iterations=solver_iterations)
    x0s = jnp.asarray(x0_grid, jnp.float32)
    n_grid = x0s.shape[0]
    kicks = jnp.asarray(u_kick_scales, jnp.float32)

    def one_group(x0, kick, k):
        """80-step closed loop for one (x0, kick)."""
        u_ws0 = jnp.full((horizon, plant.control_dim), kick)

        def step(carry, k_step):
            x, u_ws = carry
            ws = u_ws0 if cold_start else u_ws
            sol = ilqr_solve(plant, cost, x, ws, cfg)

            if n_noisy > 0:
                noise = jax.random.normal(k_step, (n_noisy, plant.state_dim)) * noise_std
                x_noisy = x[None] + noise
                noisy_sol = jax.vmap(lambda xn: ilqr_solve(plant, cost, xn, ws, cfg))(x_noisy)
                noisy_out = (x_noisy, noisy_sol.us, noisy_sol.cost, noisy_sol.backward_ok)
            else:
                noisy_out = None

            u0 = sol.us[0]
            x_next = plant.step(x, u0)
            u_ws_next = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
            return (x_next, u_ws_next), ((x, sol.us, sol.cost, sol.backward_ok), noisy_out)

        keys = jax.random.split(k, n_control_steps)
        (_, _), (nominal, noisy) = jax.lax.scan(step, (x0, u_ws0), keys)
        return nominal, noisy

    groups = jax.vmap(
        jax.vmap(one_group, in_axes=(None, 0, 0)), in_axes=(0, None, 0)
    )
    keys = jax.random.split(key, n_grid * len(u_kick_scales)).reshape(
        n_grid, len(u_kick_scales), 2
    )
    nominal, noisy = jax.jit(groups)(x0s, kicks, keys)

    to_cond = state_to_condition or (lambda x: x)
    cond_dim = int(jax.eval_shape(to_cond, jnp.zeros(plant.state_dim)).shape[0])
    cond_map = jax.jit(jax.vmap(to_cond))

    # nominal: x (G, K, S, n), us (G, K, S, H, m), J (G, K, S)
    xs_n, us_n, js_n, ok_n = nominal
    x_all = [np.asarray(cond_map(jnp.asarray(np.asarray(xs_n).reshape(-1, plant.state_dim))))]
    u_all = [np.asarray(us_n).reshape(-1, horizon, plant.control_dim)]
    j_all = [np.asarray(js_n).reshape(-1)]
    ok_all = [np.asarray(ok_n).reshape(-1)]
    if n_noisy > 0:
        xs_z, us_z, js_z, ok_z = noisy
        x_all.append(np.asarray(cond_map(jnp.asarray(np.asarray(xs_z).reshape(-1, plant.state_dim)))))
        u_all.append(np.asarray(us_z).reshape(-1, horizon, plant.control_dim))
        j_all.append(np.asarray(js_z).reshape(-1))
        ok_all.append(np.asarray(ok_z).reshape(-1))

    x_cat = np.concatenate(x_all, axis=0)
    u_cat = np.concatenate(u_all, axis=0)
    j_cat = np.concatenate(j_all, axis=0)
    ok_cat = np.concatenate(ok_all, axis=0)
    # Convergence diagnostic (VERDICT r1 item 6): fraction of solves whose
    # final backward pass had every regularized Quu PD under the Cholesky
    # check — the reference's Pool(30)+IPOPT collector has no such signal.
    converged_fraction = float(ok_cat.mean()) if ok_cat.size else 1.0
    print(f"[collect_closed_loop_dataset] solver backward-PD converged fraction: {converged_fraction:.4f}")

    # Solver-failure masking (SURVEY.md §5 hardening): the reference's
    # collector silently keeps zero rows when an IPOPT group throws
    # (`nmpc_multi_process_collect_data.py:317-318`); here non-finite
    # solutions are dropped explicitly.
    valid = (
        np.all(np.isfinite(u_cat), axis=(1, 2))
        & np.all(np.isfinite(x_cat), axis=1)
        & np.isfinite(j_cat)
    )
    n_dropped = int((~valid).sum())
    if n_dropped:
        print(f"[collect_closed_loop_dataset] dropped {n_dropped} non-finite solver results")
        u_cat, x_cat, j_cat = u_cat[valid], x_cat[valid], j_cat[valid]

    if return_arrays:
        return u_cat, x_cat, j_cat
    ds = ControlSequenceDataset.from_arrays(u_cat, x_cat, normalizer=normalizer)
    return dataclasses.replace(ds, solver_converged_fraction=converged_fraction)


def make_acrobot_grid(theta1_range, theta2_range) -> np.ndarray:
    """(theta1 x theta2) initial grid for the 6-state acrobot with virtual
    angles (reference `acrobots_nmpc.py:63-75`): state = (theta1, theta2,
    0, 0, theta1*, theta2*)."""
    from ..dynamics.acrobot import theta1_to_star, theta2_to_star

    out = []
    for t1 in np.asarray(theta1_range):
        for t2 in np.asarray(theta2_range):
            out.append([t1, t2, 0.0, 0.0, float(theta1_to_star(t1)), float(theta2_to_star(t2))])
    return np.asarray(out, dtype=np.float32)
