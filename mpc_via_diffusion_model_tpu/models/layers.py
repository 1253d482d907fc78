"""NN layer zoo for the temporal denoisers (flax.linen, channel-last).

Rebuild of `mpd/models/layers/layers.py` in idiomatic JAX: all 1-D convs run
in (batch, horizon, channels) layout — the native TPU/XLA convolution layout —
instead of torch's (batch, channels, horizon); GroupNorm/Mish fuse into the
surrounding convolutions under XLA.

Shape/semantics parity (reference `layers.py` line refs in each class):
- SinusoidalPosEmb: `layers.py:243-255`
- TimeEncoder (SinPosEmb -> Linear(4x) -> Mish -> Linear): `layers.py:229-240`
- Conv1dBlock (Conv k5 -> GroupNorm -> Mish): `layers.py:276-293`
- ResidualTemporalBlock (2 Conv1dBlocks + FiLM-style cond bias + 1x1 skip):
  `layers.py:323-355`
- Downsample1d (Conv k3 s2 p1): `layers.py:258-264`
- Upsample1d (ConvTranspose k4 s2 p1): `layers.py:267-273`
- LinearAttention (softmax-kernel linear attention): `layers.py:207-226`
- group_norm_n_groups: `layers.py:389-395`
- MLP: `layers.py:12-35`; TemporalBlockMLP: `layers.py:358-385`
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "mish",
    "group_norm_n_groups",
    "SinusoidalPosEmb",
    "TimeEncoder",
    "Conv1dBlock",
    "ResidualTemporalBlock",
    "Downsample1d",
    "Upsample1d",
    "LinearAttention",
    "MLP",
    "TemporalBlockMLP",
    "ACTIVATIONS",
    "GaussianFourierProjection",
    "ResnetBlockFC",
    "SpatialSoftArgmax",
]


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation, x * tanh(softplus(x)) (torch nn.Mish)."""
    return x * jnp.tanh(jax.nn.softplus(x))


ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "softplus": jax.nn.softplus,
    "mish": mish,
    "identity": lambda x: x,
}


def group_norm_n_groups(n_channels: int, target_n_groups: int = 8) -> int:
    """Reference `layers.py:389-395`: smallest divisor >= 8, else 1."""
    if n_channels < target_n_groups:
        return 1
    for n_groups in range(target_n_groups, target_n_groups + 10):
        if n_channels % n_groups == 0:
            return n_groups
    return 1


class SinusoidalPosEmb(nn.Module):
    """Transformer sinusoidal timestep embedding (reference `layers.py:243-255`)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        emb_scale = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeEncoder(nn.Module):
    """SinusoidalPosEmb(dim) -> Dense(4*dim) -> Mish -> Dense(dim_out)
    (reference `layers.py:229-240`)."""

    dim: int
    dim_out: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = SinusoidalPosEmb(self.dim)(t)
        h = nn.Dense(self.dim * 4)(h)
        h = mish(h)
        return nn.Dense(self.dim_out)(h)


class Conv1dBlock(nn.Module):
    """Conv1d(k, stride 1, same padding) -> GroupNorm -> Mish
    (reference `layers.py:276-293`). Input/output (B, H, C)."""

    out_channels: int
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel_size // 2
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding=[(pad, pad)])(x)
        h = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5)(h)
        return mish(h)


class ResidualTemporalBlock(nn.Module):
    """Two Conv1dBlocks with a conditioning bias added after the first, plus a
    1x1-conv residual path (reference `layers.py:323-355`).

    forward(x (B,H,C_in), c (B,E)) -> (B,H,C_out); the cond MLP is
    Mish -> Dense(C_out), broadcast over the horizon.
    """

    out_channels: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        groups = group_norm_n_groups(self.out_channels)
        h = Conv1dBlock(self.out_channels, self.kernel_size, groups)(x)
        cond = nn.Dense(self.out_channels)(mish(c))
        h = h + cond[:, None, :]
        h = Conv1dBlock(self.out_channels, self.kernel_size, groups)(h)
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1,))(x)
        else:
            res = x
        return h + res


class Downsample1d(nn.Module):
    """Conv1d(k3, s2, p1): halves the horizon (reference `layers.py:258-264`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.dim, (3,), strides=(2,), padding=[(1, 1)])(x)


class Upsample1d(nn.Module):
    """Learnable transposed conv (k4, s2) that exactly doubles the horizon —
    the architectural equivalent of the reference's
    ``ConvTranspose1d(k4, s2, p1)`` (`layers.py:267-273`, output length
    (L-1)*2 - 2 + 4 = 2L). Padding conventions differ between torch and
    lax.conv_transpose; since checkpoints are never imported from torch, only
    the op family and output length must match."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(self.dim, (4,), strides=(2,), padding=[(2, 2)])(x)


class LinearAttention(nn.Module):
    """Softmax-kernel linear attention over the horizon axis
    (reference `layers.py:207-226`). Input/output (B, H, C)."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.dim_head ** -0.5
        hidden = self.dim_head * self.heads
        qkv = nn.Dense(hidden * 3, use_bias=False)(x)  # 1x1 conv == dense over channels
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):  # (B, H, heads*dh) -> (B, heads, dh, H)
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        q = q * scale
        k = jax.nn.softmax(k, axis=-1)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhde,bhdn->bhen", context, q)
        b, h, e, n = out.shape
        out = out.transpose(0, 3, 1, 2).reshape(b, n, h * e)
        return nn.Dense(self.dim)(out)


class LayerNormChannels(nn.Module):
    """Channelwise LayerNorm with learned scale/bias, biased variance
    (reference `layers.py:194-204`)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * g + b


class PreNormResidual(nn.Module):
    """x + fn(LayerNorm(x)) (reference `Residual(PreNorm(...))`,
    `layers.py:174-191`)."""

    dim: int
    fn: nn.Module

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + self.fn(LayerNormChannels(self.dim)(x))


class MLP(nn.Module):
    """Activation-registry MLP (reference `layers.py:12-35`).

    Deviation: the reference inserts BatchNorm1d between hidden layers when
    ``batch_norm=True``; batch statistics are replaced here by LayerNorm
    (stateless, jit-friendly). The production denoiser paths never hit the
    normalized branch (n_layers=0 call sites).
    """

    out_dim: int
    hidden_dim: int = 16
    n_layers: int = 1
    act: str = "relu"
    use_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = ACTIVATIONS[self.act]
        h = act(nn.Dense(self.hidden_dim)(x))
        for _ in range(self.n_layers):
            h = nn.Dense(self.hidden_dim)(h)
            if self.use_norm:
                h = nn.LayerNorm()(h)
            h = act(h)
        return nn.Dense(self.out_dim)(h)


class TemporalBlockMLP(nn.Module):
    """MLP block with conditioning bias, for PointUnet
    (reference `layers.py:358-385`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        h = MLP(self.out_channels, hidden_dim=self.out_channels, n_layers=0, act="mish")(x)
        cond = nn.Dense(self.out_channels)(mish(c))
        return mish(h + cond)


class GaussianFourierProjection(nn.Module):
    """Fixed random Fourier features for time encoding (reference
    `layers.py:85-96`; weights frozen at init)."""

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "W", lambda k, s: jax.random.normal(k, s) * self.scale, (self.embed_dim // 2,)
        )
        w = jax.lax.stop_gradient(w)
        proj = x[:, None] * w[None, :] * 2.0 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block with zero-initialised second layer
    (reference `layers.py:39-82`)."""

    size_out: int
    size_h: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size_in = x.shape[-1]
        size_h = self.size_h or min(size_in, self.size_out)
        net = nn.Dense(size_h)(jax.nn.relu(x))
        dx = nn.Dense(self.size_out, kernel_init=nn.initializers.zeros)(jax.nn.relu(net))
        if size_in == self.size_out:
            x_s = x
        else:
            x_s = nn.Dense(self.size_out, use_bias=False)(x)
        return x_s + dx


class SpatialSoftArgmax(nn.Module):
    """Spatial soft-argmax over (B, C, H, W) feature maps (reference
    `layers.py:100-168`): temperature-scaled spatial softmax -> expected
    pixel coordinates, (B, C*2)."""

    normalize: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == 4, "expecting (B, C, H, W)"
        b, c, h, w = x.shape
        temperature = self.param("temperature", nn.initializers.ones, (1,))
        logits = (x * (h * w / temperature)).reshape(b * c, h * w)
        sm = jax.nn.softmax(logits, axis=-1)  # flattened row-major (r * w + c)
        if self.normalize:
            rows = jnp.linspace(-1.0, 1.0, h)
            cols = jnp.linspace(-1.0, 1.0, w)
        else:
            rows = jnp.arange(h, dtype=jnp.float32)
            cols = jnp.arange(w, dtype=jnp.float32)
        row_grid = jnp.repeat(rows, w)  # index r*w+c -> row r
        col_grid = jnp.tile(cols, h)  # index r*w+c -> col c
        row_mean = jnp.sum(sm * row_grid[None, :], axis=-1, keepdims=True)
        col_mean = jnp.sum(sm * col_grid[None, :], axis=-1, keepdims=True)
        # (row, col) expected-coordinate pairs, matching the reference's own
        # __main__ assertion (`layers.py:432-447`)
        return jnp.concatenate([row_mean, col_mean], axis=-1).reshape(b, c * 2)
