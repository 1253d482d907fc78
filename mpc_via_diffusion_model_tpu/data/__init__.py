from .normalization import (
    NormalizerStats,
    DatasetNormalizer,
    fit_normalizer,
    normalize,
    unnormalize,
    canonical_kind,
)
from .datasets import ControlSequenceDataset, train_val_split, specified_split
from .trajectories import TrajectoryDataset, generate_trajectories_gpmp
