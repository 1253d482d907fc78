"""Weighted elementwise losses (reference `mpd/models/diffusion_models/helpers.py:71-105`).

Pure functions over arrays instead of nn.Modules: the optional per-element
weight tensor is an argument, not a registered buffer.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

__all__ = ["weighted_l1", "weighted_l2", "LOSSES"]


def _weighted(raw: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weights is not None:
        raw = raw * weights
    return jnp.mean(raw)


def weighted_l1(pred: jnp.ndarray, target: jnp.ndarray, weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean (optionally weighted) absolute error (reference `WeightedL1`)."""
    return _weighted(jnp.abs(pred - target), weights)


def weighted_l2(pred: jnp.ndarray, target: jnp.ndarray, weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean (optionally weighted) squared error (reference `WeightedL2`)."""
    return _weighted(jnp.square(pred - target), weights)


LOSSES: Dict[str, Callable[..., jnp.ndarray]] = {
    "l1": weighted_l1,
    "l2": weighted_l2,
}
