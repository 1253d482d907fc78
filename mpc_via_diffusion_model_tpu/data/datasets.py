"""In-memory control-sequence datasets (device-resident, PRNG-batched).

Rebuild of `mpd/datasets/cart_pole_u.py` (`InputsDataset`): fields
``inputs`` (B, H, du) — expert control horizons — and ``condition`` (B, dx) —
the initial state each horizon was solved from; a LimitsNormalizer fitted per
key over the flattened data; normalized copies stored alongside (reference
`cart_pole_u.py:63-74,122-124`).

The reference keeps the whole dataset on GPU and indexes through a torch
DataLoader; here the arrays are jnp device buffers and minibatches are drawn
i.i.d. WITH replacement (`jax.random.randint` index gather) inside the jitted
train step — statistically equivalent to the reference's epoch shuffling at
these dataset sizes, and it keeps the batch op a single fused gather. The
tiny datasets (<1 GB) live in HBM, so an epoch never touches the host.

Loading: `.npz` (our native format) or the reference's `.pt` tensors (via the
CPU torch that ships in the image) for drop-in compatibility.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .normalization import DatasetNormalizer, canonical_kind

__all__ = ["ControlSequenceDataset", "train_val_split"]

FIELD_INPUTS = "inputs"
FIELD_CONDITION = "condition"


@dataclasses.dataclass(frozen=True)
class ControlSequenceDataset:
    """(inputs, condition) pairs + fitted normalizer; all arrays on device."""

    inputs: jnp.ndarray  # (B, H, du)
    condition: jnp.ndarray  # (B, dx)
    inputs_normalized: jnp.ndarray
    condition_normalized: jnp.ndarray
    normalizer: DatasetNormalizer
    # Fraction of expert solves whose final iLQR backward pass was PD-clean
    # (set by `collect_closed_loop_dataset`; None for loaded datasets).
    solver_converged_fraction: Optional[float] = None

    # -------------------------------------------------------------- #
    @classmethod
    def from_arrays(cls, inputs, condition, normalizer: str = "LimitsNormalizer") -> "ControlSequenceDataset":
        inputs = np.asarray(inputs, dtype=np.float32)
        condition = np.asarray(condition, dtype=np.float32)
        assert inputs.ndim == 3 and condition.ndim == 2 and inputs.shape[0] == condition.shape[0]
        dn = DatasetNormalizer.fit(
            {FIELD_INPUTS: inputs, FIELD_CONDITION: condition}, kind=canonical_kind(normalizer)
        )
        inputs_j = jnp.asarray(inputs)
        condition_j = jnp.asarray(condition)
        return cls(
            inputs=inputs_j,
            condition=condition_j,
            inputs_normalized=dn.normalize(inputs_j, FIELD_INPUTS),
            condition_normalized=dn.normalize(condition_j, FIELD_CONDITION),
            normalizer=dn,
        )

    @classmethod
    def load(cls, path: str, normalizer: str = "LimitsNormalizer") -> "ControlSequenceDataset":
        """Load from .npz or a .css shard (native mmap store; zero-copy host
        read). For the reference's raw .pt tensors use `load_reference_pt`."""
        if path.endswith(".npz"):
            with np.load(path) as z:
                return cls.from_arrays(z["inputs"], z["condition"], normalizer)
        if path.endswith(".css"):
            from ..native import read_store

            store = read_store(path)
            return cls.from_arrays(store["inputs"], store["condition"], normalizer)
        raise ValueError(
            f"unsupported dataset path: {path} (expected .npz or .css; "
            f"reference .pt pairs load via load_reference_pt)"
        )

    @classmethod
    def load_reference_pt(cls, u_path: str, x0_path: str, normalizer: str = "LimitsNormalizer") -> "ControlSequenceDataset":
        """Load the reference's torch tensors (`cart_pole_u.py:76-120`)."""
        import torch  # CPU torch, only for IO

        u = torch.load(u_path, map_location="cpu").float().numpy()
        x0 = torch.load(x0_path, map_location="cpu").float().numpy()
        return cls.from_arrays(u, x0, normalizer)

    def save(self, path: str) -> None:
        if path.endswith(".css"):
            from ..native import write_store

            write_store(
                path,
                {"inputs": np.asarray(self.inputs), "condition": np.asarray(self.condition)},
            )
            return
        np.savez_compressed(
            path, inputs=np.asarray(self.inputs), condition=np.asarray(self.condition)
        )

    # -------------------------------------------------------------- #
    @property
    def n_init(self) -> int:
        return int(self.inputs.shape[0])

    @property
    def n_support_points(self) -> int:
        return int(self.inputs.shape[1])

    @property
    def state_dim(self) -> int:
        """Dim of the diffused tensor (control channels), matching the
        reference's naming (`cart_pole_u.py:63-67` calls the u channel count
        'state_dim' because it is what the diffusion model denoises)."""
        return int(self.inputs.shape[2])

    @property
    def condition_dim(self) -> int:
        return int(self.condition.shape[1])

    def __len__(self) -> int:
        return self.n_init

    # -------------------------------------------------------------- #
    def normalize_condition(self, x0: jnp.ndarray) -> jnp.ndarray:
        """reference `cart_pole_u.py:185-192`."""
        return self.normalizer.normalize(x0, FIELD_CONDITION)

    def unnormalize_states(self, u_norm: jnp.ndarray) -> jnp.ndarray:
        """reference `cart_pole_u.py:194-201` (unnormalizes sampled inputs)."""
        return self.normalizer.unnormalize(u_norm, FIELD_INPUTS)

    def batch(self, key: jax.Array, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Random minibatch of (inputs_normalized, condition_normalized),
        drawn i.i.d. with replacement (see module docstring)."""
        idx = jax.random.randint(key, (batch_size,), 0, self.n_init)
        return self.inputs_normalized[idx], self.condition_normalized[idx]


def train_val_split(n: int, val_fraction: float = 0.05, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Index split mirroring the reference's random_split(0.95/0.05)
    (`train_loaders.py:219-224`)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_val = max(1, int(round(n * val_fraction)))
    return perm[n_val:], perm[:n_val]


def specified_split(
    normal_pos_range,
    normal_neg_range,
    noisy_pos_range,
    noisy_neg_range,
    val_fraction: float = 0.05,
):
    """Interleaved pos/neg normal/noisy index split (reference
    `get_specified_dataset`, `train_loaders.py:141-202`): the first
    (1 - val_fraction) of each range goes to train, the tail to validation;
    pos/neg indices are interleaved pairwise so batches stay balanced across
    the two swing-up basins.

    Returns (train_indices, val_indices) as numpy int arrays.
    """

    def split(rng):
        idx = list(rng)
        n_train = int((1 - val_fraction) * len(idx))
        return idx[:n_train], idx[n_train:]

    # Materialize first: callers may pass one-shot iterators, and the length
    # guards below must not consume what split() re-reads.
    normal_pos_range = list(normal_pos_range)
    normal_neg_range = list(normal_neg_range)
    noisy_pos_range = list(noisy_pos_range)
    noisy_neg_range = list(noisy_neg_range)
    # The pairwise interleave below would silently truncate to the shorter
    # range; the reference guarantees equal lengths by construction — fail
    # loudly instead of shrinking the dataset.
    if len(normal_pos_range) != len(normal_neg_range):
        raise ValueError("specified_split: normal pos/neg ranges must have equal length")
    if len(noisy_pos_range) != len(noisy_neg_range):
        raise ValueError("specified_split: noisy pos/neg ranges must have equal length")

    tr_np, va_np = split(normal_pos_range)
    tr_nn, va_nn = split(normal_neg_range)
    tr_zp, va_zp = split(noisy_pos_range)
    tr_zn, va_zn = split(noisy_neg_range)

    def interleave(a, b):
        return [v for pair in zip(a, b) for v in pair]

    train = interleave(tr_np, tr_nn) + interleave(tr_zp, tr_zn)
    val = interleave(va_np, va_nn) + interleave(va_zp, va_zn)
    return np.asarray(train, dtype=np.int64), np.asarray(val, dtype=np.int64)
