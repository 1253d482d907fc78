"""Bit-faithful regeneration of the reference's LMPC training datasets.

The reference's committed parity artifacts
(`model_performance_saving/model_230000/x0_{101,14}`) come from a model
trained on a 420,000-sample LMPC dataset that is NOT committed (only the
180,000-sample variant's x0 tensor is, `training_data/CartPole-LMPC/
x0_tensor_180000-4.pt`). Both datasets are produced by
`scripts/mpc_data_collecting/noisy_data_collecting.py` and are EXACTLY
reproducible:

- `np.random.seed(42)` fixes every noise draw (`noisy_data_collecting.py:30`);
- the MPC is an unconstrained linear-quadratic problem (dynamics equality
  constraints only, `noisy_data_collecting.py:283-295`), so IPOPT's solution
  equals the finite-horizon LQR feedback, and the u-horizon is a LINEAR map
  of the state: u = G x0 with G from the Riccati recursion;
- states are rounded to 4 decimals each step (`:248`), which absorbs the
  IPOPT-vs-Riccati solver noise entirely.

Validated: regenerating the 180k recipe (15x15 grid, 15 noisy, 50 steps)
reproduces the committed x0 tensor with max |diff| = 2.4e-7 (pure float32
storage roundoff), including the exact noise stream and the
cat(noisy, nominal) row order (`noisy_data_collecting.py:353-362`).

The 420k recipe is the same script at a 20x20 grid with 20 noisy replicas
(the script's own comments record that configuration: "20*20 = 400",
"400000*4" tensor shapes, `noisy_data_collecting.py:98-120`).

Also exposed: the exact initial states behind the committed artifacts. The
u track of the reference MPC loop is linear in x0 (LQR feedback), so x0 is
recoverable from the committed `u_mpc.npy` by least squares:
- x0_14: exactly index 14 of the 10x10 grid in
  `Condition_Weight_Inference.py:149-163` -> [-0.778, 0, -0.087, 0]
  (reproduces u_mpc.npy to all 4 stored decimals);
- x0_101: not on that script's committed 10x10 grid; the least-squares fit
  [-0.47370048, 7.45e-05, -0.70284374, 7.92e-04] reproduces u_mpc.npy to
  all 4 stored decimals (nominal grid point [-0.474, 0, -0.703, 0] of a
  20x20 grid, with tiny velocity offsets absorbing the solver/dynamics
  roundoff of the original run).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = [
    "lmpc_exact_discretization",
    "lmpc_lqr_gain_maps",
    "regenerate_reference_lmpc_arrays",
    "REFERENCE_X0_101",
    "REFERENCE_X0_14",
    "REFERENCE_PARITY_U_L1",
]

# exact initial states of the committed parity artifacts (see module docs)
REFERENCE_X0_14 = np.array([-0.778, 0.0, -0.087, 0.0], dtype=np.float64)
REFERENCE_X0_101 = np.array(
    [-4.73700484e-01, 7.45033549e-05, -7.02843735e-01, 7.92301149e-04],
    dtype=np.float64,
)
# the committed sum|u_diffusion - u_mpc| to beat (BASELINE.md)
REFERENCE_PARITY_U_L1 = {"x0_101": 0.1375, "x0_14": 0.1024}


def lmpc_exact_discretization(ts: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
    """ZoH-discretized (A_d, B_d) of the reference's linear cart-pole
    (`Diffusion_MPC_Inference.py:39-70`), via the augmented matrix
    exponential (the reference calls `control.c2d` per dynamics call)."""
    from scipy.linalg import expm

    a = np.array(
        [[0, 1, 0, 0], [0, -0.1, 3, 0], [0, 0, 0, 1], [0, -0.5, 30, 0]], dtype=np.float64
    )
    b = np.array([[0], [2], [0], [5]], dtype=np.float64)
    m = np.zeros((5, 5))
    m[:4, :4] = a
    m[:4, 4:] = b
    md = expm(m * ts)
    return md[:4, :4], md[:4, 4:]


def lmpc_lqr_gain_maps(horizon: int = 8) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(A_d, B_d, G) with G (H, 4): the open-loop-optimal u-horizon of the
    reference MPC problem as a linear map u* = G @ x0 (Q/R/P from
    `noisy_data_collecting.py:84-87`)."""
    a_d, b_d = lmpc_exact_discretization()
    q = np.diag([10.0, 1.0, 10.0, 1.0])
    r = np.array([[1.0]])
    p = np.diag([100.0, 1.0, 100.0, 1.0])

    v = p
    gains = []
    for _ in range(horizon):
        k = -np.linalg.solve(r + b_d.T @ v @ b_d, b_d.T @ v @ a_d)
        v = q + k.T @ r @ k + (a_d + b_d @ k).T @ v @ (a_d + b_d @ k)
        gains.append(k)
    gains = gains[::-1]

    g = np.zeros((horizon, 4))
    xi = np.eye(4)
    for t in range(horizon):
        g[t] = (gains[t] @ xi)[0]
        xi = (a_d + b_d @ gains[t]) @ xi
    return a_d, b_d, g


def regenerate_reference_lmpc_arrays(
    n_pos: int = 20,
    n_theta: int = 20,
    n_noisy: int = 20,
    control_steps: int = 50,
    horizon: int = 8,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray]:
    """Regenerate `(u (N, H, 1), x0 (N, 4))` exactly as
    `noisy_data_collecting.py` would have written them (noisy rows first,
    then nominal, `:353-362`). Defaults = the 420k dataset of model_230000;
    `(15, 15, 15)` gives the committed 180k dataset."""
    a_d, b_d, g = lmpc_lqr_gain_maps(horizon)
    np.random.seed(seed)

    rng_x = np.linspace(-1, 1, n_pos)
    rng_t = np.linspace(-np.pi / 4, np.pi / 4, n_theta)

    nom_x, noisy_x = [], []
    for m in rng_x:
        for n in rng_t:
            x0 = np.array([round(m, 4), 0.0, round(n, 4), 0.0])
            group = np.zeros((n_noisy, 4))
            # initial noisy group: per-row (1,2) draws on (pos, theta) only,
            # rounded to 4 decimals (`noisy_data_collecting.py:141-148`)
            for j in range(n_noisy):
                nz = np.random.normal(0.0, 0.15, size=(1, 2))
                group[j] = np.round(x0 + np.array([nz[0, 0], 0.0, nz[0, 1], 0.0]), 4)
            for i in range(control_steps):
                noisy_x.append(group.copy())
                nom_x.append(x0.copy())
                x0 = np.round(a_d @ x0 + b_d[:, 0] * (g @ x0)[0], 4)
                # per-step noisy group: full-4-dim draws, NOT rounded (`:264-269`)
                group = x0 + np.random.normal(0.0, 0.15, size=(n_noisy, 4))

    nom_x = np.asarray(nom_x)
    noisy_flat = np.asarray(noisy_x).reshape(-1, 4)
    x_cond = np.concatenate([noisy_flat, nom_x], axis=0)
    u_all = x_cond @ g.T
    return (
        u_all.reshape(-1, horizon, 1).astype(np.float32),
        x_cond.astype(np.float32),
    )
