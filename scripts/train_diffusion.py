"""Diffusion training CLI.

Replaces `scripts/train_diffusion/cart_pole_train.py` / `panda_train.py`:
loads a ControlSequenceDataset, builds the conditional temporal U-Net +
GaussianDiffusion from an ExperimentConfig (defaults = the reference's
flagship cart-pole config: T=25 exponential, predict-epsilon, batch 512,
lr 3e-3, EMA 0.995), trains with the jitted step, writes args.yaml +
checkpoints + loss .npy.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, help=".npz dataset path")
    p.add_argument("--results-dir", default="logs/diffusion")
    p.add_argument("--steps", type=int, default=50000)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--n-diffusion-steps", type=int, default=25)
    p.add_argument("--schedule", default="exponential")
    p.add_argument("--unet-dim", type=int, default=32)
    p.add_argument("--dim-mults-option", type=int, default=0)
    p.add_argument("--cfg-indicator", action="store_true",
                   help="append a context-present bit to the conditioning (recommended)")
    p.add_argument("--resume", default=None, help="checkpoint to resume from")
    p.add_argument("--seed", type=int, default=30)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from mpc_via_diffusion_model_tpu.core.schedules import make_schedule
    from mpc_via_diffusion_model_tpu.data.datasets import ControlSequenceDataset
    from mpc_via_diffusion_model_tpu.diffusion import GaussianDiffusion
    from mpc_via_diffusion_model_tpu.models import TemporalUnet, UNET_DIM_MULTS
    from mpc_via_diffusion_model_tpu.train import (
        DiffusionConfig, ExperimentConfig, ModelConfig, TrainConfig, Trainer,
    )

    ds = ControlSequenceDataset.load(args.dataset)
    print(f"dataset: {ds.n_init} samples, horizon {ds.n_support_points}, "
          f"u dim {ds.state_dim}, condition dim {ds.condition_dim}")

    cfg = ExperimentConfig(
        model=ModelConfig(
            state_dim=ds.state_dim, n_support_points=ds.n_support_points,
            unet_input_dim=args.unet_dim, dim_mults_option=args.dim_mults_option,
            context_dim=ds.condition_dim, cfg_indicator=args.cfg_indicator,
        ),
        diffusion=DiffusionConfig(
            variance_schedule=args.schedule, n_diffusion_steps=args.n_diffusion_steps,
        ),
        train=TrainConfig(lr=args.lr, batch_size=args.batch_size,
                          num_train_steps=args.steps, seed=args.seed),
        dataset_path=args.dataset,
        results_dir=args.results_dir,
    )
    os.makedirs(args.results_dir, exist_ok=True)
    cfg.to_yaml(os.path.join(args.results_dir, "args.yaml"))

    model = TemporalUnet(
        state_dim=cfg.model.state_dim,
        n_support_points=cfg.model.n_support_points,
        unet_input_dim=cfg.model.unet_input_dim,
        dim_mults=UNET_DIM_MULTS[cfg.model.dim_mults_option],
        context_dim=cfg.model.context_dim,
        conditioning_type="default",
        cfg_indicator=cfg.model.cfg_indicator,
    )
    diffusion = GaussianDiffusion(
        schedule=make_schedule(cfg.diffusion.variance_schedule, cfg.diffusion.n_diffusion_steps),
        predict_epsilon=cfg.diffusion.predict_epsilon,
        drop_prob=cfg.diffusion.drop_prob,
    )
    x = jnp.zeros((2, ds.n_support_points, ds.state_dim))
    params = model.init(
        jax.random.PRNGKey(cfg.train.seed), x, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, ds.condition_dim)), jnp.zeros((2, 1)),
    )
    trainer = Trainer(
        diffusion, model.apply, params, lr=cfg.train.lr,
        ema_decay=cfg.train.ema_decay, step_start_ema=cfg.train.step_start_ema,
        update_ema_every=cfg.train.update_ema_every,
        checkpoint_dir=os.path.join(args.results_dir, "checkpoints"),
    )
    if args.resume:
        trainer.resume(args.resume)
        print(f"resumed from {args.resume} at step {int(trainer.state.step)}")

    trainer.fit(
        ds, num_train_steps=cfg.train.num_train_steps, batch_size=cfg.train.batch_size,
        key=jax.random.PRNGKey(cfg.train.seed),
        steps_til_summary=cfg.train.steps_til_summary,
        steps_til_checkpoint=cfg.train.steps_til_checkpoint,
    )
    print("training done; final checkpoint at",
          os.path.join(args.results_dir, "checkpoints", "final.ckpt"))


if __name__ == "__main__":
    main()
