"""Dataset normalizers as pytrees of statistics.

Rebuild of `mpd/datasets/normalization.py`: per-key normalizers whose
statistics are computed over the dataset flattened to (N, dim) (reference
`normalization.py:58-78`). Instead of stateful objects holding the whole
dataset, each normalizer is a small frozen pytree of (mins, maxs, means,
stds) that travels inside jitted programs — normalize/unnormalize compile
into the sampling loop with zero host round-trips.

Exact semantic notes preserved from the reference:
- LimitsNormalizer maps [min, max] -> [-1, 1]; `unnormalize` CLIPS the input
  to [-1, 1] first (reference `normalization.py:156-167`). All parity numbers
  are defined in this normalized space.
- SafeLimitsNormalizer pads ALL dims by eps if ANY dim is constant —
  reference `normalization.py:175-185` applies `self.mins -= eps` to the whole
  vector inside the per-dim loop; we reproduce that exactly (eps per constant
  dim found, applied to every dim).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NormalizerStats",
    "fit_normalizer",
    "normalize",
    "unnormalize",
    "DatasetNormalizer",
    "NORMALIZERS",
]


@dataclasses.dataclass(frozen=True)
class NormalizerStats:
    """Statistics + kind tag. ``kind`` is static (hashable) so this dataclass
    can be closed over by jit without retracing on array values."""

    kind: str  # 'limits' | 'gaussian' | 'identity' | 'safe_limits' | 'fixed_limits'
    mins: jnp.ndarray
    maxs: jnp.ndarray
    means: Optional[jnp.ndarray] = None
    stds: Optional[jnp.ndarray] = None


jax.tree_util.register_pytree_node(
    NormalizerStats,
    lambda s: ((s.mins, s.maxs, s.means, s.stds), s.kind),
    lambda kind, leaves: NormalizerStats(kind, *leaves),
)


def _flatten_to_2d(x: np.ndarray) -> np.ndarray:
    """(..., d) -> (N, d), mirroring reference `normalization.py:58-78`."""
    if x.ndim == 2:
        return x
    return x.reshape(-1, x.shape[-1])


def fit_normalizer(x, kind: str = "limits", eps: float = 1.0, fixed_min: float = -1.0, fixed_max: float = 1.0) -> NormalizerStats:
    """Compute normalizer statistics from data of shape (..., d)."""
    x2 = _flatten_to_2d(np.asarray(x, dtype=np.float32))
    mins = x2.min(axis=0)
    maxs = x2.max(axis=0)
    means = x2.mean(axis=0)
    # torch .std() uses Bessel's correction (unbiased); match it. Clamp so
    # constant dims don't produce a 0 std -> inf/nan under 'gaussian'.
    stds = x2.std(axis=0, ddof=1) if x2.shape[0] > 1 else np.ones_like(means)
    stds = np.maximum(stds, 1e-8)

    if kind == "safe_limits":
        # reference `normalization.py:175-185`: for each constant dim, pad the
        # WHOLE min/max vector by eps.
        n_constant = int((mins == maxs).sum())
        mins = mins - eps * n_constant
        maxs = maxs + eps * n_constant
        kind = "limits"
    elif kind == "fixed_limits":
        mins = np.full_like(mins, fixed_min)
        maxs = np.full_like(maxs, fixed_max)
        kind = "limits"

    if kind not in ("limits", "gaussian", "identity"):
        raise ValueError(f"unknown normalizer kind '{kind}'")

    return NormalizerStats(
        kind=kind,
        mins=jnp.asarray(mins),
        maxs=jnp.asarray(maxs),
        means=jnp.asarray(means),
        stds=jnp.asarray(stds),
    )


def normalize(stats: NormalizerStats, x: jnp.ndarray) -> jnp.ndarray:
    """Apply the normalizer (reference `normalization.py:149-154,137-138`)."""
    if stats.kind == "identity":
        return x
    if stats.kind == "gaussian":
        return (x - stats.means) / stats.stds
    # limits: [min, max] -> [-1, 1]
    return 2.0 * (x - stats.mins) / (stats.maxs - stats.mins) - 1.0


def unnormalize(stats: NormalizerStats, x: jnp.ndarray) -> jnp.ndarray:
    """Invert the normalizer. For 'limits', clips to [-1, 1] first — this is
    load-bearing reference behaviour (`normalization.py:156-167`): sampled
    controls are saturated at the dataset limits."""
    if stats.kind == "identity":
        return x
    if stats.kind == "gaussian":
        return x * stats.stds + stats.means
    x = jnp.clip(x, -1.0, 1.0)
    return (x + 1.0) * 0.5 * (stats.maxs - stats.mins) + stats.mins


# Registry matching the reference's string-selected normalizers
# (`cart_pole_u.py:33`, `train_loaders.py`).
NORMALIZERS = ("limits", "gaussian", "identity", "safe_limits", "fixed_limits")

_REFERENCE_NAMES = {
    "LimitsNormalizer": "limits",
    "GaussianNormalizer": "gaussian",
    "Identity": "identity",
    "SafeLimitsNormalizer": "safe_limits",
    "FixedLimitsNormalizer": "fixed_limits",
}


def canonical_kind(name: str) -> str:
    """Accept both our kinds and the reference's class names."""
    return _REFERENCE_NAMES.get(name, name)


@dataclasses.dataclass(frozen=True)
class DatasetNormalizer:
    """Per-field normalizer dict (reference `DatasetNormalizer`,
    `normalization.py:12-44`)."""

    stats: Dict[str, NormalizerStats]

    @classmethod
    def fit(cls, fields: Dict[str, np.ndarray], kind: str = "limits") -> "DatasetNormalizer":
        kind = canonical_kind(kind)
        return cls(stats={k: fit_normalizer(v, kind) for k, v in fields.items()})

    def normalize(self, x: jnp.ndarray, key: str) -> jnp.ndarray:
        return normalize(self.stats[key], x)

    def unnormalize(self, x: jnp.ndarray, key: str) -> jnp.ndarray:
        return unnormalize(self.stats[key], x)


jax.tree_util.register_pytree_node(
    DatasetNormalizer,
    lambda dn: (tuple(dn.stats.values()), tuple(dn.stats.keys())),
    lambda keys, vals: DatasetNormalizer(stats=dict(zip(keys, vals))),
)
