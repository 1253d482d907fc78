"""Tensor parallelism over the ('model',) mesh axis (Megatron-style).

The 1M-param flagship denoiser fits one chip with room to spare, so data
parallelism over starts/batch is the right scaling axis for this framework
(`mesh.py`); this module exists to make the mesh's 'model' axis REAL rather
than admitted-but-unused: a column/row-parallel Dense pairing with the
canonical two collectives, demonstrated on the AMPC MLP baseline
(`models/ampc.py`, the reference's `AMPCNet`) and numerically parity-tested
against the unsharded model (`tests/test_tensor_parallel.py`).

Partitioning (Megatron-LM): for a Dense -> nonlinearity -> Dense pair,
shard the first kernel by OUTPUT columns (each device computes a slice of
the activation; elementwise tanh applies shard-locally) and the second by
INPUT rows (each device holds the matching slice; partial products are
summed with one `psum` over 'model'). The final output layer is
column-parallel with one tiled `all_gather`. Both collectives ride ICI on
a pod slice.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.precision import hmatmul

__all__ = ["make_tp_ampc_apply"]


def _split_cols(w, m):
    # (din, dout) -> (m, din, dout/m)
    din, dout = w.shape
    assert dout % m == 0, f"output dim {dout} must divide the model axis {m}"
    return np.stack(np.split(np.asarray(w), m, axis=1))


def _split_rows(w, m):
    # (din, dout) -> (m, din/m, dout)
    din, dout = w.shape
    assert din % m == 0, f"input dim {din} must divide the model axis {m}"
    return np.stack(np.split(np.asarray(w), m, axis=0))


def make_tp_ampc_apply(mesh: Mesh, params, control_dim: int = 1,
                       axis: str = "model") -> Callable:
    """Shard trained `AMPCNet` params over ``mesh``'s ``axis`` and return a
    jitted ``apply(x) -> (B, horizon, control_dim)`` that matches
    ``AMPCNet.apply(params, x)`` to fp tolerance.

    Layer map (state -> 2 -> 50 -> 50 -> horizon*control_dim):
      Dense_0 (tiny) replicated; Dense_1 column-parallel; Dense_2
      row-parallel (+psum, bias added once post-reduce); Dense_3
      column-parallel (+tiled all_gather).
    """
    m = int(mesh.shape[axis])
    p = params["params"]
    w0, b0 = np.asarray(p["Dense_0"]["kernel"]), np.asarray(p["Dense_0"]["bias"])
    w1, b1 = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
    w2, b2 = p["Dense_2"]["kernel"], np.asarray(p["Dense_2"]["bias"])
    w3, b3 = p["Dense_3"]["kernel"], p["Dense_3"]["bias"]

    w1s = _split_cols(w1, m)                       # (m, 2, 50/m)
    b1s = np.stack(np.split(np.asarray(b1), m))    # (m, 50/m)
    w2s = _split_rows(w2, m)                       # (m, 50/m, 50)
    w3s = _split_cols(w3, m)                       # (m, 50, H*cd/m)
    b3s = np.stack(np.split(np.asarray(b3), m))    # (m, H*cd/m)
    out_dim = int(np.asarray(w3).shape[1])

    def local_fn(x, w1_, b1_, w2_, w3_, b3_):
        # shard_map passes each device its (1, ...) slice of the stacked
        # weights; x and the replicated layers are full
        w1_, b1_, w2_, w3_, b3_ = (a[0] for a in (w1_, b1_, w2_, w3_, b3_))
        # fp32 like AMPCNet.apply — this net is a controller, and the TP
        # parity guarantee vs the flax model must hold on TPU (bf16) too
        h0 = jnp.tanh(hmatmul(x, w0) + b0)
        h1 = jnp.tanh(hmatmul(h0, w1_) + b1_)               # (B, 50/m) shard
        z2 = hmatmul(h1, w2_)                               # (B, 50) partial
        h2 = jnp.tanh(jax.lax.psum(z2, axis) + b2)          # reduce + bias once
        z3 = hmatmul(h2, w3_) + b3_                         # (B, out/m) shard
        return jax.lax.all_gather(z3, axis, axis=1, tiled=True)  # (B, out)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    w1s, b1s, w2s, w3s, b3s = (jnp.asarray(a) for a in (w1s, b1s, w2s, w3s, b3s))

    @jax.jit
    def apply(x):
        out = sharded(x, w1s, b1s, w2s, w3s, b3s)
        return out.reshape(x.shape[0], out_dim // control_dim, control_dim)

    return apply
