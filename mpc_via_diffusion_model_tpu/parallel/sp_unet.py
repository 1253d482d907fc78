"""Sequence (context) parallelism for the temporal U-Net: shard the HORIZON.

The trajectory axis H is the U-Net's sequence dimension — for long-horizon
plants (panda H=128, quadrotor H=48; the reference's Panda runs H=128 too,
`inference_diffusion_panda.py:84-90`) activations scale with H while weights
don't, so H is the natural shard axis when activations (not weights) are
what outgrows a chip: B·H·C activation rows at batch-of-candidates scale
(4096 candidates/replan, BENCH.md) dwarf the 1M-param weights.

Sharding: x (B, H, C) is split into S contiguous blocks along H, one per
device on the mesh's 'seq' axis; every weight is replicated. The three
H-coupled op families get halo/collective treatment, everything else
(FiLM, Mish, 1x1s, time/context embeds) is pointwise-local:

- **k5 'SAME' conv** -> exchange a 2-column halo with each neighbor
  (`ppermute`), then a VALID conv. ppermute fills edge devices' missing
  neighbor with zeros — exactly the global zero padding.
- **k3 s2 downsample** -> 1-column LEFT halo + VALID stride-2 conv: with an
  even per-device h, global output 2j-1..2j+1 windows never straddle the
  right boundary (alignment worked out below).
- **k4 s2 transpose conv** -> polyphase decomposition. Probed tap map of
  `lax.conv_transpose(k4, s2, pad (2,2))`: x[i] with tap t lands on output
  2i + 2 - t, so out[2m] = k0·x[m-1] + k2·x[m] (left halo) and
  out[2m+1] = k1·x[m] + k3·x[m+1] (right halo) — two local k2 convs, one
  halo each, interleaved. No cross-device accumulation needed.
- **GroupNorm** -> per-group statistics are global over H: one fused psum
  of (sum, sumsq) over 'seq' per norm.

Skip connections stay local: both operands carry the same contiguous-block
layout at every level.

Cost model per ResBlock: 2 halo exchanges of (B, 4, C) columns + 2 stat
psums of (B, groups, 2) scalars — O(B·C) bytes on ICI against O(B·H·C/S)
local conv FLOPs, so efficiency improves linearly with H/S. Divisibility:
S must divide H at the deepest level (H / 2^(levels-1)) and leave h >= 2.

The reference has no parallelism of any kind; this is the SURVEY §2.4
scaling design applied to the long-horizon axis ("long-context / SP" row of
SURVEY §5, previously documented N/A — now implemented). Parity:
tests/test_sp_unet.py asserts equality with the unsharded `model.apply` on
2/4/8-device meshes and a hybrid (data, seq) mesh.

Supports the production envelope of `ops/fused_unet.py`: conditioning_type
'default'/None, no self-attention.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.layers import group_norm_n_groups, mish
from ..models.temporal_unet import TemporalUnet
from ..ops.fused_unet import _extract_weights
from .tp_unet import _cond_vector, _conv1d, _time_embed, unet_traverse

__all__ = ["make_sp_unet_apply"]


# --------------------------------------------------------------------------- #
# halo-exchange primitives
# --------------------------------------------------------------------------- #

def _halo(x, n_left, n_right, S, axis):
    """Pad local (B, h, C) block with its neighbors' boundary columns.

    The left halo is the LEFT neighbor's last ``n_left`` columns, the right
    halo the RIGHT neighbor's first ``n_right``; ppermute gives edge devices
    zeros — which IS the global 'SAME' zero padding."""
    parts = []
    if n_left:
        left = jax.lax.ppermute(x[:, -n_left:], axis,
                                [(s, s + 1) for s in range(S - 1)])
        parts.append(left)
    parts.append(x)
    if n_right:
        right = jax.lax.ppermute(x[:, :n_right], axis,
                                 [(s + 1, s) for s in range(S - 1)])
        parts.append(right)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _conv_sp(x, kernel, bias, S, axis):
    """k-tap stride-1 'SAME' conv on the H-sharded block."""
    k = kernel.shape[0]
    xp = _halo(x, k // 2, k // 2, S, axis)
    return _conv1d(xp, kernel, bias, padding=[(0, 0)])


def _down_sp(x, kernel, bias, S, axis):
    """k3 s2 pad(1,1) downsample on the H-sharded block (even local h).

    Device block starts at even global offset o; its outputs are global
    j in [o/2, (o+h)/2): windows 2j-1..2j+1 need input o-1 (left halo 1)
    and reach at most o+h-1 (local)."""
    xp = _halo(x, 1, 0, S, axis)
    return _conv1d(xp, kernel, bias, stride=2, padding=[(0, 0)])


def _up_sp(x, kernel, bias, S, axis):
    """k4 s2 transpose conv via polyphase split (see module docstring):
    out[2m] = k0·x[m-1] + k2·x[m];  out[2m+1] = k1·x[m] + k3·x[m+1]."""
    k_even = kernel[jnp.array([0, 2])]   # taps hitting even outputs
    k_odd = kernel[jnp.array([1, 3])]    # taps hitting odd outputs
    xe = _halo(x, 1, 0, S, axis)
    even = _conv1d(xe, k_even, None, padding=[(0, 0)])   # (B, h, C)
    xo = _halo(x, 0, 1, S, axis)
    odd = _conv1d(xo, k_odd, None, padding=[(0, 0)])     # (B, h, C)
    b, h, c = even.shape
    out = jnp.stack([even, odd], axis=2).reshape(b, 2 * h, c)
    return out + bias


def _group_norm_sp(x, scale, bias, n_groups, S, axis, eps=1e-5):
    """GroupNorm with H sharded: per-(batch, group) stats psum'd over 'seq'.
    One fused psum carries both moments."""
    b, h, c = x.shape
    xg = x.reshape(b, h, n_groups, c // n_groups)
    s1 = jnp.sum(xg, axis=(1, 3))
    s2 = jnp.sum(xg * xg, axis=(1, 3))
    s1, s2 = jax.lax.psum((s1, s2), axis)
    n = h * S * (c // n_groups)
    mean = (s1 / n)[:, None, :, None]
    var = (s2 / n)[:, None, :, None] - mean * mean
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xn.reshape(b, h, c) * scale + bias


def _resblock_sp(d, film_w, film_b, x, c, groups, S, axis):
    h = _conv_sp(x, d["w1"], d["b1"], S, axis)
    h = mish(_group_norm_sp(h, d["g1"], d["be1"], groups, S, axis))
    h = h + (mish(c) @ film_w + film_b)[:, None, :]
    h = _conv_sp(h, d["w2"], d["b2"], S, axis)
    h = mish(_group_norm_sp(h, d["g2"], d["be2"], groups, S, axis))
    res = (x @ d["wr"] + d["br"]) if "wr" in d else x
    return h + res


# --------------------------------------------------------------------------- #
# the sharded forward
# --------------------------------------------------------------------------- #

def make_sp_unet_apply(
    mesh: Mesh,
    model: TemporalUnet,
    params,
    axis: str = "seq",
) -> Callable:
    """Shard the HORIZON of ``model.apply(params, ...)`` over ``mesh``'s
    ``axis`` and return a jitted
    ``apply(x, time, context, context_mask) -> eps`` numerically matching
    the unsharded forward.

    ``mesh.shape[axis]`` must divide the horizon at the deepest U-Net level
    (``n_support_points / 2**(len(dim_mults) - 1)``) with at least 2 rows
    per device.
    """
    S = int(mesh.shape[axis])
    w, in_out = _extract_weights(model, params)
    n_levels = len(in_out)
    h_deep = model.n_support_points // (2 ** (n_levels - 1))
    if h_deep % S != 0 or h_deep // S < 2:
        raise ValueError(
            f"'{axis}' size {S} must divide the deepest-level horizon "
            f"{h_deep} with >=2 rows per device "
            f"(H={model.n_support_points}, {n_levels} levels)"
        )
    w = jax.tree_util.tree_map(jnp.asarray, w)

    def local_fn(x, time, context, context_mask):
        # x: (B, H/S, C) local block; everything else replicated
        t_emb = _time_embed(w["time"], time, 32)
        c_emb = _cond_vector(model, t_emb, context, context_mask,
                             x.shape[0], x.dtype)

        def resblock(ridx, h):
            d, (fw, fb) = w["res"][ridx], w["films_w"][ridx]
            cout = d["w1"].shape[-1]
            return _resblock_sp(d, fw, fb, h, c_emb,
                                group_norm_n_groups(cout), S, axis)

        def down(ind, h):
            dw, db = w["downs"][ind]
            return _down_sp(h, dw, db, S, axis)

        def up(ind, h):
            uw, ub = w["ups"][ind]
            return _up_sp(h, uw, ub, S, axis)

        def final(h):
            fw_, fb_, fg_, fbe_ = w["final_block"]
            h = _conv_sp(h, fw_, fb_, S, axis)
            h = mish(_group_norm_sp(h, fg_, fbe_,
                                    group_norm_n_groups(model.unet_input_dim),
                                    S, axis))
            k1, b1 = w["final_1x1"]
            return h @ k1 + b1

        return unet_traverse(n_levels, x, resblock=resblock, down=down,
                             up=up, final=final)

    seq_spec = P(None, axis, None)
    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(seq_spec, P(), P(), P()),
        out_specs=seq_spec,
        check_vma=True,
    )

    def apply(x, time, context=None, context_mask=None):
        if context is None:
            context = jnp.zeros((x.shape[0], 0), x.dtype)
        if context_mask is None:
            context_mask = jnp.zeros((x.shape[0], 1), x.dtype)
        return sharded(x, time, context, context_mask)

    return jax.jit(apply)
