"""Small utility parity shims (reference `mpd/utils/` + `mpd/models/helpers/utils.py`).

Most of the reference's utility surface maps to one-liners in JAX; they are
kept here so callers migrating from the reference find the same names:

- `to_one_hot` / `from_one_hot` (reference `one_hot.py:4-15`)
- `batch_jacobian` (reference `jacobian.py:5` — autograd loop -> jax.jacobian
  + vmap)
- `calc_output` / `calc_output_conv2d_transpose` (reference
  `mpd/models/helpers/utils.py` conv shape arithmetic)
- `fix_random_seed` -> PRNG key constructor (JAX has no global seed; the
  reference relies on torch_robotics `fix_random_seed`)
- `freeze_params` -> stop_gradient over a pytree (reference
  `freeze_torch_model_params`)
- `dict_to_device` -> `jax.device_put` (the per-step copy at reference
  `trainer.py:188` does not exist here — data already lives on device)
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = [
    "to_one_hot",
    "from_one_hot",
    "batch_jacobian",
    "calc_output",
    "calc_output_conv2d_transpose",
    "fix_random_seed",
    "freeze_params",
    "dict_to_device",
]


def to_one_hot(number: int, max_val: int, min_val: int = 0) -> jnp.ndarray:
    assert max_val > min_val, "max_val must exceed min_val"
    return jax.nn.one_hot(number - min_val, max_val - min_val)


def from_one_hot(hot: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(hot, axis=-1)


def batch_jacobian(fn, x: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of fn per batch row: (B, in) -> (B, out, in). The reference
    loops torch.autograd.grad per output (`jacobian.py:5`)."""
    return jax.vmap(jax.jacobian(fn))(x)


def calc_output(in_dim, filter_size, padding=0, stride=1):
    """reference `mpd/models/helpers/utils.py:1-3`."""
    x = in_dim - filter_size + (2 * padding) + (filter_size % 2)
    return (x / stride) + (1 - (filter_size % 2))


def calc_output_conv2d_transpose(in_dim, filter_size, padding=0, stride=1, dilation=1):
    """reference `mpd/models/helpers/utils.py:6-7`."""
    return (in_dim - 1) * stride - 2 * padding + dilation * (filter_size - 1) + 1


def fix_random_seed(seed: int) -> jax.Array:
    """JAX has no global seed; return the root PRNG key to thread through."""
    return jax.random.PRNGKey(seed)


def freeze_params(params):
    """Gradient-stopped view of a parameter pytree."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, params)


def dict_to_device(batch: Dict, device=None) -> Dict:
    """Place a dict of arrays on a device (no-op for resident data)."""
    return {k: jax.device_put(v, device) for k, v in batch.items()}
