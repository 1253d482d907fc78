"""Dataset munging utilities.

Rebuild of the reference's data-modification scripts:
- `convert_condition_5_to_4`: drop the raw theta and keep theta* as the
  angle feature — 5-state (x, xdot, theta, thetadot, theta*) conditions ->
  4-state (x, xdot, theta*, thetadot) (reference
  `scripts/mpc_data_collecting/data_modify.py:14-32`, theta <- theta*).
- `check_dataset`: sanity statistics for a (u, x0) dataset (reference
  `nmpc_data_check.py:7-57` slices and eyeballs; here: shape/finite/range
  checks returned as a dict so they can be asserted in pipelines).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["convert_condition_5_to_4", "check_dataset"]


def convert_condition_5_to_4(x0_5: np.ndarray) -> np.ndarray:
    """(N, 5) -> (N, 4): (x, xdot, theta, thetadot, theta*) ->
    (x, xdot, theta*, thetadot)."""
    x0_5 = np.asarray(x0_5)
    assert x0_5.ndim == 2 and x0_5.shape[1] == 5, x0_5.shape
    out = np.empty((x0_5.shape[0], 4), dtype=x0_5.dtype)
    out[:, 0] = x0_5[:, 0]
    out[:, 1] = x0_5[:, 1]
    out[:, 2] = x0_5[:, 4]  # theta <- theta*
    out[:, 3] = x0_5[:, 3]
    return out


def check_dataset(u: np.ndarray, x0: np.ndarray, j: np.ndarray | None = None) -> Dict:
    """Shape/finiteness/range report for an expert dataset."""
    u, x0 = np.asarray(u), np.asarray(x0)
    report = {
        "n_samples": int(u.shape[0]),
        "horizon": int(u.shape[1]),
        "control_dim": int(u.shape[2]) if u.ndim == 3 else 1,
        "condition_dim": int(x0.shape[1]),
        "u_finite": bool(np.all(np.isfinite(u))),
        "x0_finite": bool(np.all(np.isfinite(x0))),
        "u_min": float(u.min()),
        "u_max": float(u.max()),
        "x0_min": float(x0.min()),
        "x0_max": float(x0.max()),
        "shapes_consistent": u.shape[0] == x0.shape[0],
    }
    if j is not None:
        j = np.asarray(j)
        report["j_finite"] = bool(np.all(np.isfinite(j)))
        report["j_mean"] = float(j.mean())
    report["ok"] = bool(
        report["u_finite"] and report["x0_finite"] and report["shapes_consistent"]
    )
    return report
