"""Typed configuration tree with YAML round-trip.

Replaces the reference's decorator-injected kwargs + hard-coded module
constants (`experiment_launcher` `@single_experiment_yaml`,
`cart_pole_train.py:17-73`, absolute paths at `cart_pole_u.py:14-25` and
`temporal_unet.py:20-26`) with one explicit dataclass tree. `to_yaml` dumps an
args.yaml-style file per run so experiment records stay compatible with the
reference's format (`trained_models/.../args.yaml`).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import yaml

__all__ = ["ModelConfig", "DiffusionConfig", "TrainConfig", "ExperimentConfig"]


@dataclasses.dataclass
class ModelConfig:
    """Denoiser architecture (reference `cart_pole_train.py:92-113` defaults)."""

    name: str = "TemporalUnet"
    state_dim: int = 1  # channels being denoised (control dim)
    n_support_points: int = 32  # horizon
    unet_input_dim: int = 32
    dim_mults_option: int = 0  # UNET_DIM_MULTS key (reference `temporal_unet.py:14-17`)
    time_emb_dim: int = 32
    self_attention: bool = False
    context_dim: int = 5
    conditioning_type: Optional[str] = "default"
    attention_num_heads: int = 2
    attention_dim_head: int = 32
    # CFG context-present indicator (see models/temporal_unet.py); changes
    # the FiLM conditioning width, so it must be recorded per checkpoint.
    cfg_indicator: bool = False


@dataclasses.dataclass
class DiffusionConfig:
    """Diffusion process (reference `cart_pole_train.py:85-90`)."""

    variance_schedule: str = "exponential"
    n_diffusion_steps: int = 25
    predict_epsilon: bool = True
    clip_denoised: bool = True
    loss_type: str = "l2"
    drop_prob: float = 0.25


@dataclasses.dataclass
class TrainConfig:
    """Optimization (reference `cart_pole_train.py:116-144`, `trainer.py:119-140`)."""

    lr: float = 3e-3
    batch_size: int = 512
    num_train_steps: int = 50000
    clip_grad_max_norm: float = 1.0
    use_ema: bool = True
    ema_decay: float = 0.995
    step_start_ema: int = 1000
    update_ema_every: int = 10
    steps_til_summary: int = 2000
    steps_til_checkpoint: int = 10000
    steps_per_validation: int = 10
    early_stopper_patience: int = -1
    val_fraction: float = 0.05
    seed: int = 30


@dataclasses.dataclass
class ExperimentConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    dataset_path: str = ""
    results_dir: str = "logs"
    plant: str = "cartpole_virtual_swingup"

    # ------------------------------------------------------------------ #
    def to_yaml(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f, sort_keys=True)

    @classmethod
    def from_yaml(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls(
            model=ModelConfig(**raw.get("model", {})),
            diffusion=DiffusionConfig(**raw.get("diffusion", {})),
            train=TrainConfig(**raw.get("train", {})),
            dataset_path=raw.get("dataset_path", ""),
            results_dir=raw.get("results_dir", "logs"),
            plant=raw.get("plant", "cartpole_virtual_swingup"),
        )
