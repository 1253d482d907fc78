"""Cross-attention conditioning blocks (flax.linen, channel-last).

Rebuild of `mpd/models/layers/layers_attention.py`: GEGLU feedforward,
multi-head cross-attention, pre-LN transformer block, and the
SpatialTransformer wrapper used for ``conditioning_type='attention'``
(reference `layers_attention.py:38-194`). The output projection is
zero-initialised so an untouched transformer is the identity (reference
`zero_module`, `layers_attention.py:68-74,181`).

Everything stays (B, H, C); the reference's Conv1d-1x1 projections become
Dense layers over the channel axis (identical math, MXU-friendly).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import group_norm_n_groups

__all__ = ["GEGLU", "FeedForward", "CrossAttention", "BasicTransformerBlock", "SpatialTransformer"]


class GEGLU(nn.Module):
    """x, gate = Dense(2*d); x * gelu(gate) (reference `layers_attention.py:38-45`)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2)(x)
        x, gate = jnp.split(h, 2, axis=-1)
        return x * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    """Gated feedforward, mult=4 (reference `layers_attention.py:48-65`)."""

    dim: int
    mult: int = 4
    glu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = int(self.dim * self.mult)
        if self.glu:
            h = GEGLU(inner)(x)
        else:
            h = jax.nn.gelu(nn.Dense(inner)(x))
        return nn.Dense(self.dim)(h)


class CrossAttention(nn.Module):
    """Multi-head cross-attention; self-attention when context is None
    (reference `layers_attention.py:83-124`)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False)(x)
        k = nn.Dense(inner, use_bias=False)(ctx)
        v = nn.Dense(inner, use_bias=False)(ctx)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.query_dim)(out)


class BasicTransformerBlock(nn.Module):
    """Pre-LN: self-attn -> cross-attn(context) -> gated FF, all residual
    (reference `layers_attention.py:127-145`)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = CrossAttention(self.dim, heads=self.n_heads, dim_head=self.d_head)(nn.LayerNorm()(x)) + x
        x = CrossAttention(self.dim, self.context_dim, self.n_heads, self.d_head)(
            nn.LayerNorm()(x), context=context
        ) + x
        x = FeedForward(self.dim)(nn.LayerNorm()(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 proj in -> transformer blocks -> zero-init 1x1 proj
    out, residual (reference `layers_attention.py:148-194`)."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.n_heads * self.d_head
        x_in = x
        h = nn.GroupNorm(num_groups=group_norm_n_groups(self.in_channels), epsilon=1e-6)(x)
        h = nn.Dense(inner)(h)
        for _ in range(self.depth):
            h = BasicTransformerBlock(inner, self.n_heads, self.d_head, self.context_dim)(h, context)
        h = nn.Dense(
            self.in_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)
        return h + x_in
