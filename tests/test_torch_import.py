"""Torch-checkpoint importer: exact forward parity vs a torch oracle.

The oracle re-implements the reference `ConditionedTemporalUnet.forward`
(`temporal_unet.py:287-358`) verbatim with torch.nn.functional ops driven
directly by the committed state dict (the reference `mpd` package itself is
unimportable: it torch.loads an absolute dataset path at import time,
`temporal_unet.py:25`). Parity to ~1e-4 fp32 on random inputs proves the
layout mapping in `models/torch_import.py` (incl. the ConvTranspose k-flip).
"""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mpc_via_diffusion_model_tpu.models import TemporalUnet
from mpc_via_diffusion_model_tpu.models.torch_import import (
    import_reference_unet,
    load_reference_state_dict,
    reference_unet_config,
)

CKPT_84K = (
    "/root/reference/trained_models/cart_pole_84000_test1/final/checkpoints/"
    "ema_model_current_state_dict.pth"
)
CKPT_230K = (
    "/root/reference/trained_models/420000_models_with_noisy_data/230000/"
    "checkpoints/ema_model_current_state_dict.pth"
)
# the reference's OTHER production family: Panda (state_dim 7, context 20,
# horizon 128; trained_models/panda_test6_117600/final/args.yaml)
CKPT_PANDA = (
    "/root/reference/trained_models/panda_test6_117600/final/checkpoints/"
    "ema_model_current_state_dict.pth"
)

needs_ckpt = pytest.mark.skipif(
    not os.path.exists(CKPT_84K), reason="reference checkpoints not mounted"
)


def _torch_oracle(sd, x, t, context, mask):
    """Reference ConditionedTemporalUnet forward ('default' conditioning,
    dim_mults (1,2,4)), straight from the state dict."""
    import math

    import torch
    import torch.nn.functional as F

    tt = lambda k: torch.from_numpy(sd[k])
    x = torch.from_numpy(x)
    t = torch.from_numpy(t)
    context = torch.from_numpy(context)
    mask = torch.from_numpy(mask)

    context = context * (1.0 - mask.repeat(1, context.shape[1]))

    # TimeEncoder: SinusoidalPosEmb(32) -> Linear -> Mish -> Linear
    half = 16
    emb = math.log(10000.0) / (half - 1)
    freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    pe = t.float()[:, None] * freqs[None, :]
    pe = torch.cat((pe.sin(), pe.cos()), dim=-1)
    h = F.linear(pe, tt("model.time_mlp.encoder.1.weight"), tt("model.time_mlp.encoder.1.bias"))
    h = F.mish(h)
    t_emb = F.linear(h, tt("model.time_mlp.encoder.3.weight"), tt("model.time_mlp.encoder.3.bias"))
    c_emb = torch.cat((t_emb, context), dim=-1).float()

    def conv_block(prefix, z, groups=8):
        z = F.conv1d(z, tt(prefix + ".0.weight"), tt(prefix + ".0.bias"), padding=2)
        z = F.group_norm(z, groups, tt(prefix + ".2.weight"), tt(prefix + ".2.bias"), eps=1e-5)
        return F.mish(z)

    def rtb(prefix, z, c):
        h1 = conv_block(prefix + ".blocks.0.block", z)
        cond = F.linear(F.mish(c), tt(prefix + ".cond_mlp.1.weight"), tt(prefix + ".cond_mlp.1.bias"))
        h1 = h1 + cond[:, :, None]
        h1 = conv_block(prefix + ".blocks.1.block", h1)
        if prefix + ".residual_conv.weight" in sd:
            res = F.conv1d(z, tt(prefix + ".residual_conv.weight"), tt(prefix + ".residual_conv.bias"))
        else:
            res = z
        return h1 + res

    z = x.permute(0, 2, 1)  # (B, C, H)
    skips = []
    for L in range(3):
        z = rtb(f"model.downs.{L}.0", z, c_emb)
        z = rtb(f"model.downs.{L}.1", z, c_emb)
        skips.append(z)
        if L < 2:
            z = F.conv1d(z, tt(f"model.downs.{L}.4.conv.weight"), tt(f"model.downs.{L}.4.conv.bias"),
                         stride=2, padding=1)

    z = rtb("model.mid_block1", z, c_emb)
    z = rtb("model.mid_block2", z, c_emb)

    for J in range(2):
        z = torch.cat((z, skips.pop()), dim=1)
        z = rtb(f"model.ups.{J}.0", z, c_emb)
        z = rtb(f"model.ups.{J}.1", z, c_emb)
        z = F.conv_transpose1d(z, tt(f"model.ups.{J}.4.conv.weight"), tt(f"model.ups.{J}.4.conv.bias"),
                               stride=2, padding=1)

    z = conv_block("model.final_conv.0.block", z)
    z = F.conv1d(z, tt("model.final_conv.1.weight"), tt("model.final_conv.1.bias"))
    return z.permute(0, 2, 1).numpy()


@needs_ckpt
@pytest.mark.parametrize("ckpt,horizon",
                         [(CKPT_84K, 32), (CKPT_230K, 8), (CKPT_PANDA, 128)])
def test_imported_forward_matches_torch_oracle(ckpt, horizon):
    if not os.path.exists(ckpt):
        pytest.skip(f"reference checkpoint not mounted: {ckpt}")
    sd = load_reference_state_dict(ckpt)
    variables, cfg = import_reference_unet(sd)
    assert cfg["dim_mults"] == (1, 2, 4)

    model = TemporalUnet(
        state_dim=cfg["state_dim"],
        n_support_points=horizon,
        unet_input_dim=cfg["unet_input_dim"],
        dim_mults=cfg["dim_mults"],
        time_emb_dim=cfg["time_emb_dim"],
        context_dim=cfg["context_dim"],
        conditioning_type="default",
    )

    rng = np.random.RandomState(0)
    b = 4
    x = rng.randn(b, horizon, cfg["state_dim"]).astype(np.float32)
    t = rng.randint(0, 25, (b,)).astype(np.int32)
    ctx = rng.randn(b, cfg["context_dim"]).astype(np.float32)
    mask = np.array([[0.0], [1.0], [0.0], [1.0]], np.float32)

    got = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                                 jnp.asarray(ctx), jnp.asarray(mask)))
    want = _torch_oracle(sd, x, t.astype(np.float32), ctx, mask)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@needs_ckpt
def test_reference_schedule_import():
    """`schedule_from_state_dict` is bit-exact with the stored buffers, and
    our fp64 `make_schedule` agrees with the reference's fp32 tables up to
    table-computation roundoff (~1e-4 near t=0)."""
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.models.torch_import import schedule_from_state_dict

    sd = load_reference_state_dict(CKPT_84K)
    s_imp = schedule_from_state_dict(sd)
    np.testing.assert_array_equal(np.asarray(s_imp.betas), sd["betas"])
    np.testing.assert_array_equal(
        np.asarray(s_imp.posterior_mean_coef1), sd["posterior_mean_coef1"]
    )

    s = make_schedule("exponential", int(sd["betas"].shape[0]))
    np.testing.assert_allclose(np.asarray(s.betas), sd["betas"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.alphas_cumprod), sd["alphas_cumprod"], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s.posterior_mean_coef1), sd["posterior_mean_coef1"], rtol=1e-3, atol=2e-4
    )
