"""Denoiser networks and baselines (flax.linen, channel-last)."""
from .layers import (
    GaussianFourierProjection,
    ResnetBlockFC,
    SpatialSoftArgmax,
    mish,
    group_norm_n_groups,
    SinusoidalPosEmb,
    TimeEncoder,
    Conv1dBlock,
    ResidualTemporalBlock,
    Downsample1d,
    Upsample1d,
    LinearAttention,
    MLP,
    TemporalBlockMLP,
)
from .attention import GEGLU, FeedForward, CrossAttention, BasicTransformerBlock, SpatialTransformer
from .temporal_unet import TemporalUnet, PointUnet, UNET_DIM_MULTS
from .ampc import AMPCNet

# String registry (reference selects models by name via getattr on the
# package, `mpd/trainer/train_loaders.py:23`).
MODELS = {
    "TemporalUnet": TemporalUnet,
    "ConditionedTemporalUnet": TemporalUnet,  # same module; pass context_mask for CFG
    "PointUnet": PointUnet,
    "AMPCNet": AMPCNet,
}
from .score_models import (
    ScoreMLP,
    ContextScoreMLP,
    SDFScoreMLP,
    SharedFeatureSDFScoreMLP,
    ve_marginal_prob_std,
    ve_diffusion_coeff,
    score_matching_loss,
    ode_likelihood,
)
from .equiv_layers import knn, get_graph_feature, get_graph_feature_cross, VNLinear, VNLeakyReLU
