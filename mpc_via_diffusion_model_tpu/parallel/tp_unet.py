"""Channel-sharded tensor parallelism for the temporal U-Net denoiser.

Megatron-style 1-D TP over the mesh's 'model' axis, applied to the conv
backbone of `models.temporal_unet.TemporalUnet` (the production CFG denoiser;
reference `mpd/models/diffusion_models/temporal_unet.py:189-358`). The
reference has no model parallelism at all — this is the promised SURVEY §2.4
artifact that makes the 'model' mesh axis real for the flagship model, not
just for the AMPC MLP (`tensor_parallel.py`).

Partitioning per ResidualTemporalBlock (`models/layers.py:120-142`):

- **conv1 column-parallel**: the k5 Conv(Cin -> Cout) kernel is split along
  OUTPUT channels; each device computes a (B, H, Cout/m) activation shard.
- **Group-aligned GroupNorm**: Cout is sharded by WHOLE GroupNorm groups
  (m must divide n_groups, usually 8), so per-group statistics are
  shard-local — no collective needed for the norm.
- **FiLM bias sharded to match**: the conditioning Dense(E -> Cout) is
  column-split identically, so the bias add is shard-local.
- **conv2 row-parallel**: the k5 Conv(Cout -> Cout) kernel is split along
  INPUT channels; each device contributes a partial sum, reduced with ONE
  `psum` over 'model' per block (the collective rides ICI on a pod slice).
  The bias, second GroupNorm and Mish apply once, post-reduce.
- The 1x1 residual conv, down/upsampling convs, time encoder and final head
  are replicated: together they are <8% of the FLOPs, and replicating them
  avoids three extra collectives per level.

Cost model: one psum of a (B, H, Cout) activation per ResBlock — 12 psums
for the 3-level flagship — against a 1/m share of ~92% of the conv FLOPs
and weights. For the 1M-param denoiser this is bandwidth-bound (documented
in BENCH.md); the module exists because SURVEY §2.4 commits to the mesh API
scaling to denoisers where channel sharding IS profitable (wider dim_mults /
longer horizons), and because the same code path is the multi-chip serving
story for models that outgrow one chip's VMEM/HBM.

Parity: `make_tp_unet_apply` is asserted numerically equal to the unsharded
`model.apply` on an 8-device CPU mesh (tests/test_tp_unet.py) and wired into
`__graft_entry__.dryrun_multichip`. TRAINING through the same sharding lives
in `tp_train.py` (2-D data x model mesh; exact-gradient via check_vma=True);
`gather_tp_params` / `weights_to_params` export TP-trained shards back to a
standard flax checkpoint.

Supports the production configs: conditioning_type='default' (or None),
self_attention=False — same envelope as `ops/fused_unet.py`.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.layers import group_norm_n_groups, mish
from ..models.temporal_unet import TemporalUnet
from ..ops.fused_unet import _extract_weights

__all__ = [
    "make_tp_unet_apply",
    "unet_apply_functional",
    "unet_traverse",
    "shard_unet_params",
    "gather_tp_params",
    "weights_to_params",
]


def unet_traverse(n_levels: int, x, *, resblock, down, up, final):
    """The TemporalUnet down/mid/up traversal skeleton, shared by every
    functional forward in this package (single-device, channel-sharded TP,
    horizon-sharded SP) so the parity-critical structure lives in ONE place.

    ``resblock(ridx, h)`` applies ResidualTemporalBlock number ``ridx`` (the
    flat index that `ops.fused_unet._extract_weights` orders blocks by);
    ``down(level, h)`` / ``up(level, h)`` re-sample between levels;
    ``final(h)`` is the output head. Matches `models.temporal_unet
    .TemporalUnet.__call__` (reference `temporal_unet.py:302-356`)."""
    ridx = 0

    def rb(h):
        nonlocal ridx
        h = resblock(ridx, h)
        ridx += 1
        return h

    h, skips = x, []
    for ind in range(n_levels):
        h = rb(rb(h))
        skips.append(h)
        if ind < n_levels - 1:
            h = down(ind, h)
    h = rb(rb(h))
    for ind in range(n_levels - 1):
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = rb(rb(h))
        h = up(ind, h)
    return final(h)


# --------------------------------------------------------------------------- #
# functional building blocks (match flax.linen semantics exactly)
# --------------------------------------------------------------------------- #

_DN = ("NWC", "WIO", "NWC")  # channel-last 1-D conv, flax kernel layout


def _conv1d(x, kernel, bias=None, stride=1, padding=None):
    k = kernel.shape[0]
    pad = padding if padding is not None else [(k // 2, k // 2)]
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride,), pad, dimension_numbers=_DN
    )
    if bias is not None:
        y = y + bias
    return y


def _conv_transpose1d(x, kernel, bias):
    # flax nn.ConvTranspose(k4, s2, padding=[(2, 2)], transpose_kernel=False)
    y = jax.lax.conv_transpose(x, kernel, (2,), [(2, 2)], dimension_numbers=_DN)
    return y + bias


def _group_norm(x, scale, bias, n_groups, eps=1e-5):
    b, h, c = x.shape
    xg = x.reshape(b, h, n_groups, c // n_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mean * mean
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xn.reshape(b, h, c) * scale + bias


def _time_embed(time_p, t, time_dim):
    half = time_dim // 2
    emb_scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb_scale)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    h = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    h = mish(h @ time_p["Dense_0"]["kernel"] + time_p["Dense_0"]["bias"])
    return h @ time_p["Dense_1"]["kernel"] + time_p["Dense_1"]["bias"]


def _resblock_full(d, film_w, film_b, x, c, groups):
    h = mish(_group_norm(_conv1d(x, d["w1"], d["b1"]), d["g1"], d["be1"], groups))
    h = h + (mish(c) @ film_w + film_b)[:, None, :]
    h = mish(_group_norm(_conv1d(h, d["w2"], d["b2"]), d["g2"], d["be2"], groups))
    res = (x @ d["wr"] + d["br"]) if "wr" in d else x
    return h + res


def _cond_vector(model: TemporalUnet, t_emb, context, context_mask, batch, dtype):
    if model.conditioning_type in (None, "None"):
        return t_emb
    assert model.conditioning_type == "default", (
        "TP U-Net supports conditioning_type in (None, 'default'); got "
        f"{model.conditioning_type!r}"
    )
    if context is not None and context_mask is not None:
        context = context * (1.0 - context_mask)
    parts = [t_emb, context]
    if model.cfg_indicator:
        present = (
            1.0 - context_mask
            if context_mask is not None
            else jnp.ones((batch, 1), dtype)
        )
        parts.append(present)
    return jnp.concatenate(parts, axis=-1)


def unet_apply_functional(model: TemporalUnet, params, x, time,
                          context=None, context_mask=None):
    """Pure-functional (no flax) forward of TemporalUnet for the production
    configs (conditioning 'default'/None, no attention). Bit-compatible with
    ``model.apply`` — the single-device semantics that `make_tp_unet_apply`
    shards; parity-tested in tests/test_tp_unet.py."""
    w, in_out = _extract_weights(model, params)
    n_levels = len(in_out)

    t_emb = _time_embed(w["time"], time, 32)
    c_emb = _cond_vector(model, t_emb, context, context_mask, x.shape[0], x.dtype)

    def resblock(ridx, h):
        d, (fw, fb) = w["res"][ridx], w["films_w"][ridx]
        cout = d["w1"].shape[-1]
        return _resblock_full(d, fw, fb, h, c_emb, group_norm_n_groups(cout))

    def down(ind, h):
        dw, db = w["downs"][ind]
        return _conv1d(h, dw, db, stride=2, padding=[(1, 1)])

    def up(ind, h):
        uw, ub = w["ups"][ind]
        return _conv_transpose1d(h, uw, ub)

    def final(h):
        fw_, fb_, fg_, fbe_ = w["final_block"]
        h = mish(_group_norm(_conv1d(h, fw_, fb_), fg_, fbe_,
                             group_norm_n_groups(model.unet_input_dim)))
        k1, b1 = w["final_1x1"]
        return h @ k1 + b1

    return unet_traverse(n_levels, x, resblock=resblock, down=down, up=up,
                         final=final)


# --------------------------------------------------------------------------- #
# sharding
# --------------------------------------------------------------------------- #

def _split(a, m, ax):
    """(…) -> (m, …) stacked shards along axis ``ax``."""
    return np.stack(np.split(np.asarray(a), m, axis=ax))


def _shard_resblock(d, film_w, film_b, m):
    """Split one ResBlock's params into (sharded, replicated) dicts.

    Sharded (leading m axis): conv1 cols, GN1 scale/bias, FiLM cols,
    conv2 rows. Replicated: conv2 bias, GN2, residual 1x1.
    """
    shd = {
        "w1": _split(d["w1"], m, 2), "b1": _split(d["b1"], m, 0),
        "g1": _split(d["g1"], m, 0), "be1": _split(d["be1"], m, 0),
        "fw": _split(film_w, m, 1), "fb": _split(film_b, m, 0),
        "w2": _split(d["w2"], m, 1),
    }
    rep = {"b2": np.asarray(d["b2"]), "g2": np.asarray(d["g2"]),
           "be2": np.asarray(d["be2"])}
    if "wr" in d:
        rep["wr"], rep["br"] = np.asarray(d["wr"]), np.asarray(d["br"])
    return shd, rep


def _resblock_tp(shd, rep, x, c, groups, m, axis):
    """One device's slice of a TP ResBlock. shd leaves carry a leading
    (1,)-slice axis from shard_map; groups is the FULL group count."""
    w1, b1, g1, be1, fw, fb, w2 = (shd[k][0] for k in
                                   ("w1", "b1", "g1", "be1", "fw", "fb", "w2"))
    h = _conv1d(x, w1, b1)                                   # (B, H, C/m)
    h = mish(_group_norm(h, g1, be1, groups // m))           # group-aligned
    h = h + (mish(c) @ fw + fb)[:, None, :]
    part = _conv1d(h, w2)                                    # (B, H, C) partial
    full = jax.lax.psum(part, axis) + rep["b2"]
    full = mish(_group_norm(full, rep["g2"], rep["be2"], groups))
    res = (x @ rep["wr"] + rep["br"]) if "wr" in rep else x
    return full + res


def shard_unet_params(model: TemporalUnet, params, m: int):
    """Split flax TemporalUnet ``params`` into (shd_tree, rep_tree) for an
    m-way 'model' axis. shd leaves carry a leading shard axis of size m;
    rep leaves are replicated. Inverse: `gather_tp_params`.

    Requires ``m`` to divide every block's GroupNorm group count (8 for the
    standard widths), so norm statistics stay shard-local.
    """
    w, in_out = _extract_weights(model, params)
    n_levels = len(in_out)

    for d in w["res"]:
        cout = d["w1"].shape[-1]
        g = group_norm_n_groups(cout)
        assert g % m == 0, (
            f"model axis {m} must divide the GroupNorm group count {g} "
            f"(block width {cout}) for group-aligned channel sharding"
        )

    shd_blocks, rep_blocks = [], []
    for d, (fw, fb) in zip(w["res"], w["films_w"]):
        s, r = _shard_resblock(d, fw, fb, m)
        shd_blocks.append(s)
        rep_blocks.append(r)
    groups_per_block = [group_norm_n_groups(d["w1"].shape[-1]) for d in w["res"]]

    rep_tree = {
        "blocks": rep_blocks,
        "downs": [(np.asarray(a), np.asarray(b)) for a, b in w["downs"]],
        "ups": [(np.asarray(a), np.asarray(b)) for a, b in w["ups"]],
        "final_block": tuple(np.asarray(a) for a in w["final_block"]),
        "final_1x1": tuple(np.asarray(a) for a in w["final_1x1"]),
        "time": jax.tree_util.tree_map(np.asarray, w["time"]),
    }
    shd_tree = {"blocks": shd_blocks}
    rep_tree = jax.tree_util.tree_map(jnp.asarray, rep_tree)
    shd_tree = jax.tree_util.tree_map(jnp.asarray, shd_tree)
    return shd_tree, rep_tree, groups_per_block, n_levels


def _cat(stacked, ax):
    """(m, …) stacked shards -> concatenated along original axis ``ax``."""
    return jnp.concatenate([stacked[i] for i in range(stacked.shape[0])], axis=ax)


def gather_tp_params(model: TemporalUnet, shd_tree, rep_tree):
    """Merge (shd_tree, rep_tree) back into standard flax ``{'params': …}``
    — the inverse of `shard_unet_params`, so TP-TRAINED weights round-trip
    into the single-device checkpoint format (trainer save/load, fused
    kernels, torch export)."""
    res, films_w = [], []
    for s, r in zip(shd_tree["blocks"], rep_tree["blocks"]):
        d = {
            "w1": _cat(s["w1"], 2), "b1": _cat(s["b1"], 0),
            "g1": _cat(s["g1"], 0), "be1": _cat(s["be1"], 0),
            "w2": _cat(s["w2"], 1), "b2": r["b2"],
            "g2": r["g2"], "be2": r["be2"],
        }
        if "wr" in r:
            d["wr"], d["br"] = r["wr"], r["br"]
        res.append(d)
        films_w.append((_cat(s["fw"], 1), _cat(s["fb"], 0)))
    w = {
        "res": res, "films_w": films_w,
        "downs": rep_tree["downs"], "ups": rep_tree["ups"],
        "final_block": rep_tree["final_block"],
        "final_1x1": rep_tree["final_1x1"], "time": rep_tree["time"],
    }
    return weights_to_params(model, w)


def weights_to_params(model: TemporalUnet, w):
    """Rebuild the flax param tree from the w-layout — exact inverse of
    `ops.fused_unet._extract_weights` (round-trip tested)."""
    p = {}
    for i, (d, (fw, fb)) in enumerate(zip(w["res"], w["films_w"])):
        rb = {
            "Conv1dBlock_0": {
                "Conv_0": {"kernel": d["w1"], "bias": d["b1"]},
                "GroupNorm_0": {"scale": d["g1"], "bias": d["be1"]},
            },
            "Conv1dBlock_1": {
                "Conv_0": {"kernel": d["w2"], "bias": d["b2"]},
                "GroupNorm_0": {"scale": d["g2"], "bias": d["be2"]},
            },
            "Dense_0": {"kernel": fw, "bias": fb},
        }
        if "wr" in d:
            rb["Conv_0"] = {"kernel": d["wr"][None], "bias": d["br"]}
        p[f"ResidualTemporalBlock_{i}"] = rb
    for i, (k, b) in enumerate(w["downs"]):
        p[f"Downsample1d_{i}"] = {"Conv_0": {"kernel": k, "bias": b}}
    for i, (k, b) in enumerate(w["ups"]):
        p[f"Upsample1d_{i}"] = {"ConvTranspose_0": {"kernel": k, "bias": b}}
    fw_, fb_, fg_, fbe_ = w["final_block"]
    p["Conv1dBlock_0"] = {"Conv_0": {"kernel": fw_, "bias": fb_},
                          "GroupNorm_0": {"scale": fg_, "bias": fbe_}}
    k1, b1 = w["final_1x1"]
    p["Conv_0"] = {"kernel": k1[None], "bias": b1}
    p["TimeEncoder_0"] = w["time"]
    return {"params": p}


def make_local_forward(model: TemporalUnet, n_levels, groups_per_block,
                       m: int, axis: str) -> Callable:
    """Per-device TP forward ``f(x, time, context, context_mask, shd, rep)``
    producing the FULL (B, H, out) output on every device (the per-block
    psum re-materializes full activations). Differentiable — `tp_train.py`
    takes grads through it under check_vma=True."""

    def local_fn(x, time, context, context_mask, shd, rep):
        t_emb = _time_embed(rep["time"], time, 32)
        c_emb = _cond_vector(model, t_emb, context, context_mask,
                             x.shape[0], x.dtype)

        def resblock(ridx, h):
            return _resblock_tp(shd["blocks"][ridx], rep["blocks"][ridx], h,
                                c_emb, groups_per_block[ridx], m, axis)

        def down(ind, h):
            dw, db = rep["downs"][ind]
            return _conv1d(h, dw, db, stride=2, padding=[(1, 1)])

        def up(ind, h):
            uw, ub = rep["ups"][ind]
            return _conv_transpose1d(h, uw, ub)

        def final(h):
            fw_, fb_, fg_, fbe_ = rep["final_block"]
            h = mish(_group_norm(_conv1d(h, fw_, fb_), fg_, fbe_,
                                 group_norm_n_groups(model.unet_input_dim)))
            k1, b1 = rep["final_1x1"]
            return h @ k1 + b1

        return unet_traverse(n_levels, x, resblock=resblock, down=down,
                             up=up, final=final)

    return local_fn


def make_tp_unet_apply(
    mesh: Mesh,
    model: TemporalUnet,
    params,
    axis: str = "model",
) -> Callable:
    """Shard trained TemporalUnet ``params`` over ``mesh``'s ``axis`` and
    return a jitted ``apply(x, time, context, context_mask) -> eps`` matching
    ``model.apply(params, ...)`` to fp32 tolerance.

    Requires ``mesh.shape[axis]`` to divide every block's GroupNorm group
    count (8 for the standard widths), so norm statistics stay shard-local.
    """
    m = int(mesh.shape[axis])
    shd_tree, rep_tree, groups_per_block, n_levels = shard_unet_params(
        model, params, m
    )
    local_fn = make_local_forward(model, n_levels, groups_per_block, m, axis)

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def apply(x, time, context=None, context_mask=None):
        b = x.shape[0]
        if context is None:
            context = jnp.zeros((b, 0), x.dtype)
        if context_mask is None:
            context_mask = jnp.zeros((b, 1), x.dtype)
        return sharded(x, time, context, context_mask, shd_tree, rep_tree)

    return apply
