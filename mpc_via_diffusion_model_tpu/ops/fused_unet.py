"""Fully-fused temporal U-Net forward as ONE Pallas TPU kernel.

Why: profiling (memory/axon-tpu-jax-quirks.md) shows the XLA U-Net forward
costs ~58us at batch 2 — ~25 tiny ops x ~2us fixed per-op cost — and a
replan is nothing but 30 of these forwards. This kernel executes the entire
conv backbone (10 ResBlocks + down/ups + final head) in a single Mosaic
kernel with every weight resident in VMEM (~4 MB for the 1M-param flagship).

Layout trick: the whole batch is processed in ONE program by stacking batch
into rows, x: (B, H, C) -> (B*H, C). On the MXU a (64, C) matmul costs the
same as a (32, C) one (128-row tiles), so batching is free up to ~128 rows:

- k-tap convolutions are shifted (B*H, Cin) @ (Cin, Cout) matmuls; the
  'same'-padding row masks use iota % H, which simultaneously zeroes the
  out-of-range taps of EVERY batch element (no cross-batch bleed),
- GroupNorm statistics per (batch, group) use two one-hot matmuls
  (batch-selector and channel->group), Mosaic-friendly (no 3-D reshapes),
- stride-2 downsampling / transposed-conv upsampling are block-diagonal
  selection-matrix matmuls kron(I_B, S); the per-level operators are
  extracted numerically from the real flax layers at build time, so the
  kernel matches the XLA path's semantics by construction,
- FiLM biases, the time-embedding MLP, and the final 1x1 conv run XLA-side
  (tiny; they fuse into the surrounding sampler math).

Supports the reference's production configs: conditioning 'default', no
self-attention, any dim_mults/horizon with H divisible by 2^(levels-1),
B*H <= a few hundred rows (the control-loop regime).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import group_norm_n_groups, mish
from ..models.temporal_unet import TemporalUnet

__all__ = ["make_fused_unet", "build_unet_ops"]


# --------------------------------------------------------------------------- #
# static operator extraction
# --------------------------------------------------------------------------- #

def _probe_downsample(h: int) -> np.ndarray:
    """S (h/2, h): out = S @ conv_full for the stride-2 k3 p1 conv
    (out[t] = conv_full[2t], flax Conv semantics)."""
    s = np.zeros((h // 2, h), dtype=np.float32)
    s[np.arange(h // 2), 2 * np.arange(h // 2)] = 1.0
    return s


def _probe_upsample_taps(h: int) -> List[np.ndarray]:
    """Per-tap expansion matrices E_k (2h, h) for Upsample1d (flax
    ConvTranspose k4 s2 padding (2,2)): y = sum_k E_k @ x @ W[k]. Extracted
    numerically from the real layer — immune to padding-convention drift."""
    from flax import linen as nn

    taps = []
    for k in range(4):
        layer = nn.ConvTranspose(1, (4,), strides=(2,), padding=[(2, 2)], use_bias=False)
        x = jnp.eye(h, dtype=jnp.float32)[:, :, None]  # h basis inputs as batch
        w = np.zeros((4, 1, 1), dtype=np.float32)
        w[k, 0, 0] = 1.0
        out = layer.apply({"params": {"kernel": jnp.asarray(w)}}, x)  # (h, 2h, 1)
        taps.append(np.asarray(out)[:, :, 0].T.astype(np.float32))  # (2h, h)
    return taps


def _group_onehot(cout: int) -> np.ndarray:
    g = group_norm_n_groups(cout)
    cpg = cout // g
    m = np.zeros((cout, g), dtype=np.float32)
    m[np.arange(cout), np.arange(cout) // cpg] = 1.0
    return m


def _batch_onehot(b: int, h: int) -> np.ndarray:
    """(B*h, B) one-hot of the batch id of each stacked row."""
    m = np.zeros((b * h, b), dtype=np.float32)
    m[np.arange(b * h), np.arange(b * h) // h] = 1.0
    return m


# --------------------------------------------------------------------------- #
# kernel building blocks (traced inside the pallas kernel)
# --------------------------------------------------------------------------- #

def _shifted_matmul_conv(x, w, b, h_per, taps):
    """k-tap 'same' conv on batch-stacked rows. x (B*h, Cin), w (k, Cin,
    Cout); row masks via iota % h_per protect batch boundaries."""
    rows = x.shape[0]
    row_in_b = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % h_per
    acc = jnp.zeros((rows, w.shape[-1]), jnp.float32) + b
    half = taps // 2
    for k in range(taps):
        shift = k - half
        xs = pltpu.roll(x, (-shift) % rows, axis=0)
        if shift < 0:
            xs = jnp.where(row_in_b >= -shift, xs, 0.0)
        elif shift > 0:
            xs = jnp.where(row_in_b < h_per - shift, xs, 0.0)
        acc = acc + jnp.dot(xs.astype(w.dtype), w[k], preferred_element_type=jnp.float32)
    return acc


def _groupnorm_mish(y, member, bsel, h_per, gamma, beta, eps=1e-5):
    """Per-(batch, group) GroupNorm + Mish on stacked rows.
    y (B*h, C), member (C, g), bsel (B*h, B)."""
    cpg = y.shape[1] // member.shape[1]
    denom = float(h_per * cpg)
    # (B, g) statistics via two one-hot matmuls
    sums = jnp.dot(jnp.dot(bsel.T, y, preferred_element_type=jnp.float32), member,
                   preferred_element_type=jnp.float32)
    sq = jnp.dot(jnp.dot(bsel.T, y * y, preferred_element_type=jnp.float32), member,
                 preferred_element_type=jnp.float32)
    mean_bg = sums / denom
    var_bg = sq / denom - mean_bg * mean_bg
    mean_rows = jnp.dot(jnp.dot(bsel, mean_bg, preferred_element_type=jnp.float32), member.T,
                        preferred_element_type=jnp.float32)
    inv_rows = jnp.dot(jnp.dot(bsel, jax.lax.rsqrt(var_bg + eps), preferred_element_type=jnp.float32),
                       member.T, preferred_element_type=jnp.float32)
    yn = (y - mean_rows) * inv_rows * gamma + beta
    return yn * jnp.tanh(jax.nn.softplus(yn))


# --------------------------------------------------------------------------- #
# parameter extraction from the flax tree
# --------------------------------------------------------------------------- #

def _extract_weights(model: TemporalUnet, params) -> Tuple[Dict, List[Tuple[int, int]]]:
    p = params["params"]
    dims = [model.state_dim] + [model.unet_input_dim * m for m in model.dim_mults]
    in_out = list(zip(dims[:-1], dims[1:]))
    n_levels = len(in_out)
    n_res = 2 * n_levels + 2 + 2 * (n_levels - 1)

    def conv_block(rb, idx):
        cb = rb[f"Conv1dBlock_{idx}"]
        return (cb["Conv_0"]["kernel"], cb["Conv_0"]["bias"],
                cb["GroupNorm_0"]["scale"], cb["GroupNorm_0"]["bias"])

    res, films_w = [], []
    for i in range(n_res):
        rb = p[f"ResidualTemporalBlock_{i}"]
        w1, b1, g1, be1 = conv_block(rb, 0)
        w2, b2, g2, be2 = conv_block(rb, 1)
        d = {"w1": w1, "b1": b1, "g1": g1, "be1": be1,
             "w2": w2, "b2": b2, "g2": g2, "be2": be2}
        if "Conv_0" in rb:
            d["wr"] = rb["Conv_0"]["kernel"][0]
            d["br"] = rb["Conv_0"]["bias"]
        res.append(d)
        films_w.append((rb["Dense_0"]["kernel"], rb["Dense_0"]["bias"]))

    downs = [(p[f"Downsample1d_{i}"]["Conv_0"]["kernel"], p[f"Downsample1d_{i}"]["Conv_0"]["bias"])
             for i in range(n_levels - 1)]
    ups = [(p[f"Upsample1d_{i}"]["ConvTranspose_0"]["kernel"], p[f"Upsample1d_{i}"]["ConvTranspose_0"]["bias"])
           for i in range(n_levels - 1)]
    fin = p["Conv1dBlock_0"]
    final_block = (fin["Conv_0"]["kernel"], fin["Conv_0"]["bias"],
                   fin["GroupNorm_0"]["scale"], fin["GroupNorm_0"]["bias"])
    final_1x1 = (p["Conv_0"]["kernel"][0], p["Conv_0"]["bias"])
    return {
        "res": res, "films_w": films_w, "downs": downs, "ups": ups,
        "final_block": final_block, "final_1x1": final_1x1, "time": p["TimeEncoder_0"],
    }, in_out


# --------------------------------------------------------------------------- #
# public builder
# --------------------------------------------------------------------------- #

def build_unet_ops(model: TemporalUnet, params, batch_size: int, weights_dtype=jnp.float32) -> Dict:
    """Shared builder for the fused kernels: extracts weights/operators for a
    FIXED batch size and returns

    - ``flat``: the list of arrays to pass as pallas inputs (after films),
    - ``body(W, films, x_rows) -> y_rows``: the full conv backbone on
      batch-stacked rows (pre final-1x1), traceable inside any pallas kernel
      (``W(idx)`` reads ``flat[idx]``; ``films`` is (n_res, B, max_c)),
    - ``films_w``, ``final_1x1``, ``time``: the XLA-side pieces,
    - shape metadata (``horizon``, ``n_res``, ``max_c``, ``out_dim``).

    ``weights_dtype=jnp.bfloat16`` stores the conv weights and resampling
    operators in bf16 (half the VMEM footprint; the MXU computes bf16 x bf16
    -> fp32 with ``preferred_element_type``, activations stay fp32).
    """
    assert model.conditioning_type == "default", "fused kernel supports 'default' conditioning"
    assert not model.self_attention, "fused kernel does not support self-attention"

    weights, in_out = _extract_weights(model, params)
    n_levels = len(in_out)
    horizon = model.n_support_points
    assert horizon % (2 ** (n_levels - 1)) == 0
    b = batch_size

    hs = [horizon // (2 ** i) for i in range(n_levels)]
    # block-diagonal stacked operators
    s_mats = [jnp.asarray(np.kron(np.eye(b, dtype=np.float32), _probe_downsample(hs[i])))
              for i in range(n_levels - 1)]
    up_taps = [
        [jnp.asarray(np.kron(np.eye(b, dtype=np.float32), t))
         for t in _probe_upsample_taps(hs[n_levels - 1 - i])]
        for i in range(n_levels - 1)
    ]
    members = {c: jnp.asarray(_group_onehot(c)) for c in set(co for _, co in in_out)}
    bsels = {h: jnp.asarray(_batch_onehot(b, h)) for h in hs}

    res_w, films_w = weights["res"], weights["films_w"]
    downs_w, ups_w = weights["downs"], weights["ups"]
    fb_w, f1_w, time_p = weights["final_block"], weights["final_1x1"], weights["time"]

    flat: List[jnp.ndarray] = []

    def push(*arrs):
        idxs = []
        for a in arrs:
            flat.append(jnp.asarray(a, weights_dtype))
            idxs.append(len(flat) - 1)
        return idxs

    def push_f32(*arrs):
        # GroupNorm scale/bias and conv biases stay fp32 (added to fp32
        # activations; bf16 here would round the bias path).
        idxs = []
        for a in arrs:
            flat.append(jnp.asarray(a, jnp.float32))
            idxs.append(len(flat) - 1)
        return idxs

    res_idx = []
    for d in res_w:
        mat_keys = ["w1", "w2"] + (["wr"] if "wr" in d else [])
        vec_keys = ["b1", "g1", "be1", "b2", "g2", "be2"] + (["br"] if "wr" in d else [])
        idxs = {}
        for k in mat_keys:
            idxs[k] = push(d[k])[0]
        for k in vec_keys:
            idxs[k] = push_f32(d[k])[0]
        res_idx.append(idxs)
    down_idx = [(push(w_)[0], push_f32(b_)[0]) for w_, b_ in downs_w]
    up_idx = [(push(w_)[0], push_f32(b_)[0]) for w_, b_ in ups_w]
    fb_idx = (push(fb_w[0])[0],) + tuple(push_f32(*fb_w[1:]))
    member_idx = {c: push(m)[0] for c, m in members.items()}
    bsel_idx = {h: push(m)[0] for h, m in bsels.items()}
    s_idx = [push(s)[0] for s in s_mats]
    up_tap_idx = [[push(t)[0] for t in taps] for taps in up_taps]

    n_res = len(res_w)
    max_c = max(co for _, co in in_out)

    def body(W, films, x):
        """x: (B*horizon, state_dim) stacked rows -> (B*horizon, unet_dim)."""

        def film_rows(r, h_per, c):
            # (B, c) -> stacked rows (B*h, c)
            return jnp.dot(W(bsel_idx[h_per]).astype(jnp.float32), films[r][:, :c],
                           preferred_element_type=jnp.float32)

        def rb(x, r, h_per):
            d = {k: W(ix) for k, ix in res_idx[r].items()}
            cout = d["g1"].shape[0]
            member = W(member_idx[cout]).astype(jnp.float32)
            bsel = W(bsel_idx[h_per]).astype(jnp.float32)
            h1 = _groupnorm_mish(
                _shifted_matmul_conv(x, d["w1"], d["b1"], h_per, 5),
                member, bsel, h_per, d["g1"], d["be1"])
            h1 = h1 + film_rows(r, h_per, cout)
            h2 = _groupnorm_mish(
                _shifted_matmul_conv(h1, d["w2"], d["b2"], h_per, 5),
                member, bsel, h_per, d["g2"], d["be2"])
            if "wr" in d:
                resid = jnp.dot(x.astype(d["wr"].dtype), d["wr"],
                                preferred_element_type=jnp.float32) + d["br"]
            else:
                resid = x
            return h2 + resid

        skips = []
        r = 0
        for lvl in range(n_levels):
            h_per = hs[lvl]
            x = rb(x, r, h_per); r += 1
            x = rb(x, r, h_per); r += 1
            skips.append(x)
            if lvl < n_levels - 1:
                wd, bd = W(down_idx[lvl][0]), W(down_idx[lvl][1])
                x = jnp.dot(W(s_idx[lvl]).astype(jnp.float32),
                            _shifted_matmul_conv(x, wd, bd, h_per, 3),
                            preferred_element_type=jnp.float32)

        h_per = hs[-1]
        x = rb(x, r, h_per); r += 1
        x = rb(x, r, h_per); r += 1

        for u, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            h_per = hs[n_levels - 1 - u]
            sk = skips[n_levels - 1 - u]
            x = jnp.concatenate([x, sk], axis=-1)
            x = rb(x, r, h_per); r += 1
            x = rb(x, r, h_per); r += 1
            wu, bu = W(up_idx[u][0]), W(up_idx[u][1])
            acc = jnp.zeros((x.shape[0] * 2, dim_in), jnp.float32) + bu
            for k in range(4):
                acc = acc + jnp.dot(
                    jnp.dot(W(up_tap_idx[u][k]).astype(jnp.float32), x,
                            preferred_element_type=jnp.float32).astype(wu.dtype),
                    wu[k], preferred_element_type=jnp.float32)
            x = acc

        wf, bf, gf, bef = W(fb_idx[0]), W(fb_idx[1]), W(fb_idx[2]), W(fb_idx[3])
        return _groupnorm_mish(
            _shifted_matmul_conv(x, wf, bf, horizon, 5),
            W(member_idx[wf.shape[-1]]).astype(jnp.float32),
            W(bsel_idx[horizon]).astype(jnp.float32), horizon, gf, bef)

    return {
        "flat": flat,
        "body": body,
        "films_w": films_w,
        "final_1x1": f1_w,
        "time": time_p,
        "horizon": horizon,
        "n_res": n_res,
        "max_c": max_c,
        "out_dim": in_out[0][1],
        "in_out": in_out,
    }


def time_embedding_table(time_p, t_eff) -> jnp.ndarray:
    """Precompute the TimeEncoder output for a STATIC array of eval
    timesteps: SinusoidalPosEmb(32) -> Dense -> mish -> Dense, evaluated
    host-side once at build time. Shared by every fused chain/episode
    builder (the embedding width must track models/layers.py::TimeEncoder)."""
    half = 16
    emb_scale = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb_scale)
    args = np.asarray(t_eff, np.float64)[:, None] * freqs[None, :]
    sin_emb = np.concatenate([np.sin(args), np.cos(args)], axis=-1).astype(np.float32)
    h1 = np.asarray(mish(jnp.asarray(sin_emb) @ time_p["Dense_0"]["kernel"]
                         + time_p["Dense_0"]["bias"]))
    return jnp.asarray(h1 @ np.asarray(time_p["Dense_1"]["kernel"])
                       + np.asarray(time_p["Dense_1"]["bias"]))


def append_final_1x1(flat: List[jnp.ndarray], f1_w, weights_dtype) -> Tuple[int, int]:
    """Append the final 1x1 conv weights to the flat pallas-input list
    (kernel in ``weights_dtype``, bias fp32); returns (w1_idx, b1_idx)."""
    w1, b1 = f1_w
    flat.append(jnp.asarray(w1, weights_dtype))
    flat.append(jnp.asarray(b1, jnp.float32))
    return len(flat) - 2, len(flat) - 1


def append_film_weights(flat: List[jnp.ndarray], films_w) -> List[Tuple[int, int]]:
    """Append the per-res-block FiLM Dense (kernel, bias) pairs UNPADDED to
    the flat list (the episode kernels compute films in-kernel as a python
    list indexed statically by body()); returns [(w_idx, b_idx), ...]."""
    film_idx = []
    for wf_, bf_ in films_w:
        flat.append(jnp.asarray(wf_, jnp.float32))
        flat.append(jnp.asarray(bf_, jnp.float32))
        film_idx.append((len(flat) - 2, len(flat) - 1))
    return film_idx


def stack_film_weights(films_w, max_c) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-padded stacked FiLM weights for the XLA-side one-einsum film
    precompute used by the per-replan chain kernels:
    (n_res, cond, max_c), (n_res, max_c)."""
    wf_stack = jnp.stack([
        jnp.pad(wf_, ((0, 0), (0, max_c - wf_.shape[1]))) for wf_, _ in films_w
    ])
    bf_stack = jnp.stack([
        jnp.pad(bf_, (0, max_c - bf_.shape[0])) for _, bf_ in films_w
    ])
    return wf_stack, bf_stack


def make_fused_unet(model: TemporalUnet, params, batch_size: int, interpret: bool = False,
                    weights_dtype=jnp.float32) -> Callable:
    """Build ``fused(x, t, context, context_mask) -> eps_hat`` for a FIXED
    batch size (the block-diagonal resampling operators are baked per batch).
    Matches ``model.apply(params, ...)`` within bf16-vs-fp32 tolerance."""
    ops = build_unet_ops(model, params, batch_size, weights_dtype)
    flat = ops["flat"]
    body = ops["body"]
    films_w, f1_w, time_p = ops["films_w"], ops["final_1x1"], ops["time"]
    horizon, max_c = ops["horizon"], ops["max_c"]
    b = batch_size

    def kernel(x_ref, films_ref, *refs):
        out_ref = refs[-1]
        w = refs[:-1]

        def W(idx):
            return w[idx][...]

        films = films_ref[...]  # (n_res, B, max_c)
        x = x_ref[...].reshape(b * horizon, -1)
        y = body(W, films, x)
        out_ref[...] = y.reshape(b, horizon, -1)

    def fused(x, t, context, context_mask=None):
        assert x.shape[0] == b, f"fused kernel built for batch {b}, got {x.shape[0]}"
        present = None
        if context is not None and context_mask is not None:
            context = context * (1.0 - context_mask)
            present = 1.0 - context_mask
        elif context is not None:
            present = jnp.ones((x.shape[0], 1), x.dtype)
        # TimeEncoder XLA-side: SinusoidalPosEmb(32) -> Dense -> mish -> Dense
        half = 16
        emb_scale = np.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb_scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        sin_emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        te = time_p
        h1 = mish(sin_emb @ te["Dense_0"]["kernel"] + te["Dense_0"]["bias"])
        t_emb = h1 @ te["Dense_1"]["kernel"] + te["Dense_1"]["bias"]
        parts = [t_emb] + ([context] if context is not None else [])
        if getattr(model, "cfg_indicator", False) and present is not None:
            # the model's FiLM Dense layers were trained with the
            # context-present bit appended (models/temporal_unet.py)
            parts.append(present)
        c_emb = jnp.concatenate(parts, axis=-1)

        mc = mish(c_emb)
        films = jnp.stack([
            jnp.pad(mc @ wf_ + bf_, ((0, 0), (0, max_c - bf_.shape[-1])))
            for wf_, bf_ in films_w
        ])  # (n_res, B, max_c)

        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        y = pl.pallas_call(
            kernel,
            in_specs=[full()] * (2 + len(flat)),
            out_specs=full(),
            out_shape=jax.ShapeDtypeStruct((b, horizon, ops["out_dim"]), jnp.float32),
            interpret=interpret,
        )(x, films, *flat)

        return y @ f1_w[0] + f1_w[1]

    return fused
