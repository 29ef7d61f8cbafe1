from .attention import ChannelAttention, HybridAttention, LandmarkAttention, SpatialAttention
from .classifier import AttentionClassifier, EnsembleClassifier, MLPClassifier
from .efficientnet import (
    EfficientNetBackbone,
    EfficientNetClassifier,
    block_args,
    feature_dim,
    frozen_stage_mask,
    param_group_labels,
    round_filters,
    round_repeats,
)
from .feature_extractor import (
    DeepfakeDetectionModel,
    DeepfakeFeatureExtractor,
    create_model_from_config,
)

__all__ = [
    "AttentionClassifier",
    "ChannelAttention",
    "DeepfakeDetectionModel",
    "DeepfakeFeatureExtractor",
    "EfficientNetBackbone",
    "EfficientNetClassifier",
    "EnsembleClassifier",
    "HybridAttention",
    "LandmarkAttention",
    "MLPClassifier",
    "SpatialAttention",
    "block_args",
    "create_model_from_config",
    "feature_dim",
    "frozen_stage_mask",
    "param_group_labels",
    "round_filters",
    "round_repeats",
]
