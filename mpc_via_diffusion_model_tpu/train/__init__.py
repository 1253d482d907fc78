from .config import ModelConfig, DiffusionConfig, TrainConfig, ExperimentConfig
from .regression import fit_mlp_regression
from .trainer import (
    TrainState,
    Trainer,
    EarlyStopper,
    make_train_step,
    make_custom_train_step,
    make_scanned_train_steps,
    make_eval_step,
    make_optimizer,
    save_checkpoint,
    load_checkpoint,
)
