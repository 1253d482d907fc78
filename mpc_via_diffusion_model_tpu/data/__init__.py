from .normalization import (
    NormalizerStats,
    DatasetNormalizer,
    fit_normalizer,
    normalize,
    unnormalize,
    canonical_kind,
)
