"""AMPC MLP baseline: direct x0 -> u-horizon regression.

Rebuild of the reference's `AMPCNet`
(`scripts/train_diffusion/NN_cart_pole_train.py:32-51`): state_dim -> 2 -> 50
-> 50 -> horizon, tanh activations, linear output reshaped to
(batch, horizon, control_dim). This is the non-diffusion baseline the
reference compares against in `NMPC_NN_Inference.py` / `NN_MPC_Inference.py`.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..utils.precision import HIGHEST

__all__ = ["AMPCNet"]


class AMPCNet(nn.Module):
    """``hidden`` defaults to the reference's exact (2, 50, 50) stack —
    including its 2-unit bottleneck first layer; pass wider widths for the
    capacity-unconstrained variant (scripts/amortize_flagship.py)."""

    horizon: int
    control_dim: int = 1
    hidden: tuple = (2, 50, 50)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, state_dim) normalized -> (B, horizon, control_dim) normalized."""
        # fp32 matmuls: this net IS the controller (its output feeds the
        # plant directly), so the TPU bf16 matmul default corrupts the
        # closed loop — same policy as utils.precision.hmatmul. The few-kB
        # Dense layers gain nothing from bf16 anyway.
        h = x
        for width in self.hidden:
            h = jnp.tanh(nn.Dense(width, precision=HIGHEST)(h))
        h = nn.Dense(self.horizon * self.control_dim, precision=HIGHEST)(h)
        return h.reshape(x.shape[0], self.horizon, self.control_dim)
