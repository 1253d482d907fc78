"""Temporal 1-D conv U-Net denoisers (flax.linen, channel-last).

Rebuild of `mpd/models/diffusion_models/temporal_unet.py`. One module covers
both reference classes:

- ``TemporalUnet`` (reference `temporal_unet.py:28-187`) — call without a
  ``context_mask``.
- ``ConditionedTemporalUnet`` (reference `temporal_unet.py:189-358`) — the
  production CFG cart-pole/Panda model; call with a ``context_mask`` and the
  context is zeroed where mask==1 (reference `:296-300`).

The reference's ``conditioning_embed_dim`` default comes from a module-level
``torch.load`` of an absolute dataset path at import time
(`temporal_unet.py:20-26`) — here it is an explicit ``context_dim`` field.

Architecture (reference dims option 0, `UNET_DIM_MULTS[0]=(1,2,4)`):
input (B, H, state_dim); channels state_dim->32->64->128; each level two
ResidualTemporalBlocks conditioned on cat(time_emb(32), context); stride-2
downsample between levels; two mid blocks; symmetric up path with skip
concatenation; final Conv1dBlock + 1x1 conv back to state_dim. ~1.0 M params
for the flagship config (cond_dim 5, horizon 32, 1 channel), matching the
checkpoint inspected in BASELINE.md.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .attention import SpatialTransformer
from .layers import (
    Conv1dBlock,
    Downsample1d,
    LinearAttention,
    MLP,
    PreNormResidual,
    ResidualTemporalBlock,
    TemporalBlockMLP,
    TimeEncoder,
    Upsample1d,
    group_norm_n_groups,
)

__all__ = ["TemporalUnet", "PointUnet", "UNET_DIM_MULTS"]

# reference `temporal_unet.py:14-17`
UNET_DIM_MULTS = {0: (1, 2, 4), 1: (1, 2, 4, 8)}


class TemporalUnet(nn.Module):
    """Conditional temporal U-Net over (batch, horizon, state_dim).

    conditioning_type:
      - None / 'None': unconditional (context ignored).
      - 'default': context concatenated to the time embedding; feeds every
        ResBlock's cond MLP (FiLM-style bias). The CFG production path.
      - 'concatenate': context tiled along the horizon and concatenated to
        the (optionally encoded) state channels.
      - 'attention': cross-attention to the context at every level.
    """

    state_dim: int
    n_support_points: int = 32
    unet_input_dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4)
    time_emb_dim: int = 32
    self_attention: bool = False
    context_dim: int = 0
    conditioning_type: Optional[str] = "default"
    attention_num_heads: int = 2
    attention_dim_head: int = 32
    # Append an explicit context-present bit to the conditioning vector.
    # The reference's CFG drops the context by ZEROING it
    # (temporal_unet.py:296-300), which makes a dropped context
    # indistinguishable from a genuine near-zero context — near the origin
    # the model then samples from the MARGINAL u distribution (measured:
    # 49% catastrophic-outlier rate at near-zero cart-pole states). The
    # indicator removes the ambiguity. Off by default for reference parity /
    # checkpoint compatibility.
    cfg_indicator: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: (B, H, D); time: (B,); context: (B, C); context_mask: (B, 1)
        with 1 = drop the context (reference `temporal_unet.py:287-300`)."""
        cond_type = None if self.conditioning_type in (None, "None") else self.conditioning_type
        b, horizon, _ = x.shape

        if context is not None and context_mask is not None:
            # CFG drop: zero the context where mask == 1
            context = context * (1.0 - context_mask)

        t_emb = TimeEncoder(32, self.time_emb_dim)(time)
        c_emb = t_emb
        ctx_seq = None
        if cond_type == "default":
            parts = [t_emb, context]
            if self.cfg_indicator:
                if context_mask is not None:
                    present = 1.0 - context_mask
                else:
                    present = jnp.ones((b, 1), x.dtype)
                parts.append(present)
            c_emb = jnp.concatenate(parts, axis=-1)
        elif cond_type == "concatenate":
            if self.state_dim < self.context_dim // 4:
                state_emb_dim = self.context_dim // 4
                x_emb = MLP(state_emb_dim, hidden_dim=state_emb_dim // 2, n_layers=1, act="mish")(x)
            else:
                x_emb = x
            tiled = jnp.broadcast_to(context[:, None, :], (b, horizon, context.shape[-1]))
            x = jnp.concatenate([x_emb, tiled], axis=-1)
        elif cond_type == "attention":
            ctx_seq = context[:, None, :]  # (B, 1, C)

        dims = [x.shape[-1]] + [self.unet_input_dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_levels = len(in_out)

        def maybe_self_attn(h, dim):
            if self.self_attention:
                return PreNormResidual(dim, LinearAttention(dim))(h)
            return h

        def maybe_cross_attn(h, dim):
            if cond_type == "attention":
                return SpatialTransformer(
                    dim, self.attention_num_heads, self.attention_dim_head,
                    depth=1, context_dim=self.context_dim,
                )(h, ctx_seq)
            return h

        skips = []
        h = x
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_levels - 1
            h = ResidualTemporalBlock(dim_out)(h, c_emb)
            h = ResidualTemporalBlock(dim_out)(h, c_emb)
            h = maybe_self_attn(h, dim_out)
            h = maybe_cross_attn(h, dim_out)
            skips.append(h)
            if not is_last:
                h = Downsample1d(dim_out)(h)

        mid_dim = dims[-1]
        h = ResidualTemporalBlock(mid_dim)(h, c_emb)
        h = maybe_self_attn(h, mid_dim)
        h = maybe_cross_attn(h, mid_dim)
        h = ResidualTemporalBlock(mid_dim)(h, c_emb)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = ResidualTemporalBlock(dim_in)(h, c_emb)
            h = ResidualTemporalBlock(dim_in)(h, c_emb)
            h = maybe_self_attn(h, dim_in)
            h = maybe_cross_attn(h, dim_in)
            # mirror of reference `temporal_unet.py:267-280`: with
            # len(dim_mults)=3 there are 2 up levels and both upsample.
            if ind < n_levels - 1:
                h = Upsample1d(dim_in)(h)

        h = Conv1dBlock(self.unet_input_dim, 5, group_norm_n_groups(self.unet_input_dim))(h)
        h = nn.Conv(self.state_dim, (1,))(h)
        return h


class PointUnet(nn.Module):
    """MLP 'U-Net' for horizon-1 (single point) denoising
    (reference `temporal_unet.py:451-550`)."""

    state_dim: int
    dim: int = 32
    dim_mults: Sequence[int] = (1, 2, 4)
    time_emb_dim: int = 32
    context_dim: int = 0
    conditioning_type: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: (B, 1, D) -> (B, 1, D)."""
        cond_type = None if self.conditioning_type in (None, "None") else self.conditioning_type
        h = x[:, 0, :]

        if context is not None and context_mask is not None:
            context = context * (1.0 - context_mask)

        t_emb = TimeEncoder(32, self.time_emb_dim)(time)
        c_emb = t_emb
        if cond_type == "default":
            c_emb = jnp.concatenate([t_emb, context], axis=-1)
        elif cond_type == "concatenate":
            h = jnp.concatenate([h, context], axis=-1)

        dims = [h.shape[-1]] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        skips = []
        for _, dim_out in in_out:
            h = TemporalBlockMLP(dim_out)(h, c_emb)
            skips.append(h)

        h = TemporalBlockMLP(dims[-1])(h, c_emb)

        for dim_in, _ in reversed(in_out[1:]):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = TemporalBlockMLP(dim_in)(h, c_emb)

        h = MLP(self.state_dim, hidden_dim=self.dim, n_layers=0, act="identity")(h)
        return h[:, None, :]
