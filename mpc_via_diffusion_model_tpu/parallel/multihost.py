"""Multi-host initialization helpers.

The reference farms independent single-GPU jobs over SLURM
(`cart_pole_launch.py:49-65`); the TPU-native equivalent is one SPMD program
over all hosts of a pod slice: `jax.distributed.initialize` + a global mesh.
ICI carries the collectives inside a slice; DCN across slices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize_multihost", "make_global_mesh"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed. On TPU pods the arguments auto-detect from
    the environment; pass them explicitly for CPU/GPU clusters. Safe to call
    when already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def make_global_mesh(axis_names: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over ALL global devices (local + remote hosts)."""
    devs = np.asarray(jax.devices())
    if shape is not None:
        devs = devs.reshape(tuple(shape))
    return Mesh(devs, axis_names=axis_names)
