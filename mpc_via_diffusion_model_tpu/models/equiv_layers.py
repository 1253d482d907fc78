"""Vector-neuron (VN) equivariant layers + kNN graph features.

Rebuild of `mpd/models/layers/equiv_layers.py` (SO(3)-equivariant vector
neurons a la Deng et al.). In the reference this module is imported by
`layers/__init__.py:1` but unused by any training or inference path; it is
kept here for inventory parity, implemented as working jnp functions / flax
modules (the torch originals at `equiv_layers.py:8,17,47`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["knn", "get_graph_feature", "get_graph_feature_cross", "VNLinear", "VNLeakyReLU"]

EPS = 1e-8


def knn(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k nearest neighbours (reference `equiv_layers.py:8-14`).

    x: (B, D, N) point features -> (B, N, k) neighbour indices."""
    inner = -2.0 * jnp.einsum("bdn,bdm->bnm", x, x)
    xx = jnp.sum(x ** 2, axis=1, keepdims=True)  # (B, 1, N)
    pairwise = -xx.transpose(0, 2, 1) - inner - xx  # negative squared distance
    return jax.lax.top_k(pairwise, k)[1]  # (B, N, k)


def _gather_neighbours(x_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x_flat: (B, N, D); idx: (B, N, k) -> (B, N, k, D)."""
    return jax.vmap(lambda xf, ix: xf[ix])(x_flat, idx)


def get_graph_feature(x: jnp.ndarray, k: int = 20) -> jnp.ndarray:
    """Edge features [x_j - x_i, x_i] over kNN graphs for vector features
    (reference `equiv_layers.py:17-44`).

    x: (B, 3*C, N) stacked vector features -> (B, 2*C, 3, N, k)."""
    b, d3, n = x.shape
    c = d3 // 3
    idx = knn(x, k)
    x_flat = x.transpose(0, 2, 1)  # (B, N, 3C)
    feat = _gather_neighbours(x_flat, idx)  # (B, N, k, 3C)
    xi = jnp.broadcast_to(x_flat[:, :, None, :], feat.shape)
    out = jnp.concatenate([feat - xi, xi], axis=-1)  # (B, N, k, 6C)
    out = out.reshape(b, n, k, 2 * c, 3)
    return out.transpose(0, 3, 4, 1, 2)  # (B, 2C, 3, N, k)


def get_graph_feature_cross(x: jnp.ndarray, k: int = 20) -> jnp.ndarray:
    """Edge features [x_j - x_i, x_i x x_j, x_i] including the cross product
    (reference `equiv_layers.py:47-76`). x: (B, 3*C, N) -> (B, 3*C', 3, N, k)."""
    b, d3, n = x.shape
    c = d3 // 3
    idx = knn(x, k)
    x_flat = x.transpose(0, 2, 1)
    feat = _gather_neighbours(x_flat, idx)  # (B, N, k, 3C)
    xi = jnp.broadcast_to(x_flat[:, :, None, :], feat.shape)
    feat_v = feat.reshape(b, n, k, c, 3)
    xi_v = xi.reshape(b, n, k, c, 3)
    cross = jnp.cross(xi_v, feat_v)
    out = jnp.concatenate([feat_v - xi_v, cross, xi_v], axis=3)  # (B, N, k, 3C, 3)
    return out.transpose(0, 3, 4, 1, 2)  # (B, 3C, 3, N, k)


class VNLinear(nn.Module):
    """Channel-mixing linear map acting identically on the 3 vector
    components — SO(3)-equivariant by construction."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, C, 3, ...) -> (B, out, 3, ...)."""
        w = self.param("kernel", nn.initializers.lecun_normal(), (self.out_channels, x.shape[1]))
        return jnp.einsum("oc,bcdn...->bodn...", w, x) if x.ndim > 3 else jnp.einsum(
            "oc,bcd->bod", w, x
        )


class VNLeakyReLU(nn.Module):
    """Vector leaky-ReLU: reflect vectors lying in the learned negative
    half-space (Deng et al.)."""

    in_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = VNLinear(self.in_channels)(x)
        dot = jnp.sum(x * d, axis=2, keepdims=True)
        d_norm_sq = jnp.sum(d * d, axis=2, keepdims=True)
        mask = (dot >= 0).astype(x.dtype)
        x_reflected = x - (dot / (d_norm_sq + EPS)) * d
        return self.negative_slope * x + (1 - self.negative_slope) * (
            mask * x + (1 - mask) * x_reflected
        )
