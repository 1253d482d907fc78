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

__all__ = ["AMPCNet"]


class AMPCNet(nn.Module):
    horizon: int
    control_dim: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, state_dim) normalized -> (B, horizon, control_dim) normalized."""
        h = jnp.tanh(nn.Dense(2)(x))
        h = jnp.tanh(nn.Dense(50)(h))
        h = jnp.tanh(nn.Dense(50)(h))
        h = nn.Dense(self.horizon * self.control_dim)(h)
        return h.reshape(x.shape[0], self.horizon, self.control_dim)
