"""Torch-checkpoint importer: reference `ConditionedTemporalUnet` -> flax.

Loads the reference's committed EMA state dicts (e.g.
`trained_models/420000_models_with_noisy_data/230000/checkpoints/
ema_model_current_state_dict.pth`) into this framework's `TemporalUnet`
parameter tree, so the reference's own trained models run through the
TPU engine for apples-to-apples closed-loop parity (VERDICT r1 item 2).

Layout mapping (verified numerically to 0 ULP on random inputs,
`tests/test_torch_import.py`):

- torch Linear weight (out, in)        -> flax Dense kernel (in, out): transpose
- torch Conv1d weight (out, in, k)     -> flax Conv kernel (k, in, out): transpose(2, 1, 0)
- torch ConvTranspose1d weight (in, out, k), k=4 s=2 p=1
                                       -> flax ConvTranspose kernel (k, in, out)
                                          with padding [(2, 2)]: FLIP the k axis,
                                          then transpose(2, 0, 1). torch's
                                          transposed conv correlates the
                                          zero-stuffed input with the FLIPPED
                                          kernel; flax's `nn.ConvTranspose`
                                          (lax.conv_transpose,
                                          transpose_kernel=False) does not flip.
- torch GroupNorm weight/bias          -> flax GroupNorm scale/bias (same order;
                                          both group channels in contiguous
                                          chunks, eps 1e-5)

Module index mapping (reference `temporal_unet.py:189-358` vs our
`TemporalUnet`, which numbers ResidualTemporalBlocks in call order):

    downs.{L}.{0,1}   -> ResidualTemporalBlock_{2L}, _{2L+1}
    downs.{L}.4.conv  -> Downsample1d_{L}/Conv_0           (L < n_levels-1)
    mid_block{1,2}    -> ResidualTemporalBlock_{2n}, _{2n+1}
    ups.{J}.{0,1}     -> ResidualTemporalBlock_{2n+2+2J}, _{2n+3+2J}
    ups.{J}.4.conv    -> Upsample1d_{J}/ConvTranspose_0
    time_mlp.encoder.{1,3} -> TimeEncoder_0/Dense_{0,1}
    final_conv.0.block     -> Conv1dBlock_0
    final_conv.1           -> Conv_0

Within a ResidualTemporalBlock prefix P:
    P.blocks.{i}.block.0 (conv)      -> Conv1dBlock_{i}/Conv_0
    P.blocks.{i}.block.2 (groupnorm) -> Conv1dBlock_{i}/GroupNorm_0
    P.cond_mlp.1                     -> Dense_0
    P.residual_conv                  -> Conv_0   (only when in_ch != out_ch)
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "import_reference_unet",
    "load_reference_state_dict",
    "reference_unet_config",
    "schedule_from_state_dict",
]


def schedule_from_state_dict(sd: Dict[str, np.ndarray]):
    """Build a `DiffusionSchedule` from the checkpoint's own stored buffers
    (reference `diffusion_model_base.py:87-109`) — bit-exact with the tables
    the reference sampled with. `make_schedule` recomputes the same math in
    fp64 and differs from the reference's fp32 tables by ~1e-4 at t=0
    (e.g. posterior_mean_coef1[0]: 1.0 exact vs 0.99983406 in fp32)."""
    from ..core.schedules import DiffusionSchedule
    import jax.numpy as jnp

    f32 = lambda k: jnp.asarray(sd[k], jnp.float32)
    alphas_cumprod = np.asarray(sd["alphas_cumprod"], np.float64)
    return DiffusionSchedule(
        n_steps=int(sd["betas"].shape[0]),
        betas=f32("betas"),
        alphas_cumprod=f32("alphas_cumprod"),
        alphas_cumprod_prev=f32("alphas_cumprod_prev"),
        sqrt_alphas_cumprod=f32("sqrt_alphas_cumprod"),
        sqrt_one_minus_alphas_cumprod=f32("sqrt_one_minus_alphas_cumprod"),
        log_one_minus_alphas_cumprod=f32("log_one_minus_alphas_cumprod"),
        sqrt_recip_alphas_cumprod=f32("sqrt_recip_alphas_cumprod"),
        sqrt_recipm1_alphas_cumprod=f32("sqrt_recipm1_alphas_cumprod"),
        posterior_variance=f32("posterior_variance"),
        posterior_log_variance_clipped=f32("posterior_log_variance_clipped"),
        posterior_mean_coef1=f32("posterior_mean_coef1"),
        posterior_mean_coef2=f32("posterior_mean_coef2"),
    )


def load_reference_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth state dict to numpy (CPU torch, IO only)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().numpy() for k, v in sd.items()}


def reference_unet_config(sd: Dict[str, np.ndarray]) -> Dict:
    """Infer the `TemporalUnet` constructor args from a reference state dict.

    The reference stores the diffusion wrapper's schedule buffers alongside
    the denoiser weights (`diffusion_model_base.py:73-112`); the denoiser
    keys carry a `model.` prefix.
    """
    state_dim = sd["model.final_conv.1.weight"].shape[0]
    unet_input_dim = sd["model.downs.0.0.blocks.0.block.0.weight"].shape[0]
    t_emb_dim = sd["model.time_mlp.encoder.3.weight"].shape[0]
    cond_in = sd["model.downs.0.0.cond_mlp.1.weight"].shape[1]
    context_dim = cond_in - t_emb_dim
    # count down levels: downs.{L}.0 exists for each level
    n_levels = 0
    while f"model.downs.{n_levels}.0.blocks.0.block.0.weight" in sd:
        n_levels += 1
    dim_mults = tuple(
        sd[f"model.downs.{L}.0.blocks.0.block.0.weight"].shape[0] // unet_input_dim
        for L in range(n_levels)
    )
    return dict(
        state_dim=int(state_dim),
        unet_input_dim=int(unet_input_dim),
        time_emb_dim=int(t_emb_dim),
        context_dim=int(context_dim),
        dim_mults=dim_mults,
        conditioning_type="default",
        n_diffusion_steps=int(sd["betas"].shape[0]) if "betas" in sd else None,
    )


def _dense(sd, key):
    return {"kernel": sd[key + ".weight"].T.copy(), "bias": sd[key + ".bias"].copy()}


def _conv(sd, key):
    return {
        "kernel": sd[key + ".weight"].transpose(2, 1, 0).copy(),
        "bias": sd[key + ".bias"].copy(),
    }


def _conv_transpose(sd, key):
    w = sd[key + ".weight"]  # (in, out, k)
    return {
        "kernel": w[:, :, ::-1].transpose(2, 0, 1).copy(),
        "bias": sd[key + ".bias"].copy(),
    }


def _group_norm(sd, key):
    return {"scale": sd[key + ".weight"].copy(), "bias": sd[key + ".bias"].copy()}


def _res_block(sd, prefix: str) -> Dict:
    out = {}
    for i in (0, 1):
        out[f"Conv1dBlock_{i}"] = {
            "Conv_0": _conv(sd, f"{prefix}.blocks.{i}.block.0"),
            "GroupNorm_0": _group_norm(sd, f"{prefix}.blocks.{i}.block.2"),
        }
    out["Dense_0"] = _dense(sd, f"{prefix}.cond_mlp.1")
    if f"{prefix}.residual_conv.weight" in sd:
        out["Conv_0"] = _conv(sd, f"{prefix}.residual_conv")
    return out


def import_reference_unet(
    sd: Dict[str, np.ndarray], config: Optional[Dict] = None
) -> Tuple[Dict, Dict]:
    """Convert a reference state dict to a flax params dict for our
    `TemporalUnet` (cfg_indicator=False). Returns (variables, config)."""
    cfg = config or reference_unet_config(sd)
    n_levels = len(cfg["dim_mults"])

    p: Dict = {}
    p["TimeEncoder_0"] = {
        "Dense_0": _dense(sd, "model.time_mlp.encoder.1"),
        "Dense_1": _dense(sd, "model.time_mlp.encoder.3"),
    }

    rtb = 0
    for L in range(n_levels):
        for i in (0, 1):
            p[f"ResidualTemporalBlock_{rtb}"] = _res_block(sd, f"model.downs.{L}.{i}")
            rtb += 1
        if L < n_levels - 1:
            p[f"Downsample1d_{L}"] = {"Conv_0": _conv(sd, f"model.downs.{L}.4.conv")}

    p[f"ResidualTemporalBlock_{rtb}"] = _res_block(sd, "model.mid_block1"); rtb += 1
    p[f"ResidualTemporalBlock_{rtb}"] = _res_block(sd, "model.mid_block2"); rtb += 1

    for J in range(n_levels - 1):
        for i in (0, 1):
            p[f"ResidualTemporalBlock_{rtb}"] = _res_block(sd, f"model.ups.{J}.{i}")
            rtb += 1
        p[f"Upsample1d_{J}"] = {"ConvTranspose_0": _conv_transpose(sd, f"model.ups.{J}.4.conv")}

    p["Conv1dBlock_0"] = {
        "Conv_0": _conv(sd, "model.final_conv.0.block.0"),
        "GroupNorm_0": _group_norm(sd, "model.final_conv.0.block.2"),
    }
    p["Conv_0"] = _conv(sd, "model.final_conv.1")

    import jax.numpy as jnp
    import jax

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, p)}
    return variables, cfg
