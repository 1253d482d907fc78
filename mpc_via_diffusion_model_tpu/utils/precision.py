"""Matmul precision policy.

On TPU, `jnp.matmul`/`@` default to bf16 MXU passes. That is the right choice
for the denoiser (where the FLOPs are) but WRONG for control math: a batched
`K @ (x - x_ref)` feedback term inside a scan accumulates ~1-2% error over an
8-step rollout in bf16 (measured on this chip; see
memory/axon-tpu-jax-quirks.md). Every matmul in dynamics / solvers / the
control runtime must therefore pin fp32 accumulation explicitly — a global
`jax_default_matmul_precision` flip would silently slow the denoiser down.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["HIGHEST", "hmatmul"]

HIGHEST = jax.lax.Precision.HIGHEST


def hmatmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """fp32-exact matmul/matvec for control-critical math."""
    return jnp.matmul(a, b, precision=HIGHEST)
