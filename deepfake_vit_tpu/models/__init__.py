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
from .scrfd import ScrfdDetector
from .vit import ViTClassifier, convert_hf_vit
from .convert import (
    convert_detection_model,
    convert_efficientnet_backbone,
    load_torch_state_dict,
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
    "ScrfdDetector",
    "SpatialAttention",
    "ViTClassifier",
    "convert_detection_model",
    "convert_efficientnet_backbone",
    "convert_hf_vit",
    "load_torch_state_dict",
    "block_args",
    "create_model_from_config",
    "feature_dim",
    "frozen_stage_mask",
    "param_group_labels",
    "round_filters",
    "round_repeats",
]
