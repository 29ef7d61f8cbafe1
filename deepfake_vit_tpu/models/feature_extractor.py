"""Feature extractor + full detection model (flax, NHWC).

Capability parity with reference
``src/feature_extraction/feature_extractor.py:16-299``:

- ``DeepfakeFeatureExtractor``: backbone feature maps → HybridAttention →
  global average pool → dropout → (B, 1792) features; optional attention-map
  return, multi-scale pooled intermediates, L2-normalized embeddings.
- ``DeepfakeDetectionModel``: extractor + MLP head
  (Dense → BatchNorm → ReLU → Dropout per hidden dim [512, 128, 32], final
  Dense → num_classes); ``__call__`` returns the (logits, features) tuple
  contract; ``predict`` applies softmax.

The train step jit-compiles ``apply`` over the mesh; BatchNorm batch stats
are global under pjit (XLA inserts the cross-device mean), which matches
single-device semantics exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import HybridAttention, LandmarkAttention
from .efficientnet import EfficientNetBackbone, feature_dim


class DeepfakeFeatureExtractor(nn.Module):
    variant: str = "b4"
    pretrained: bool = True  # weight loading handled by models/convert.py at init time
    freeze_bn: bool = False
    dropout_rate: float = 0.4
    use_attention: bool = True
    use_landmark: bool = True
    use_spatial: bool = True
    use_channel: bool = True
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        return feature_dim(self.variant)

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        landmarks: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_attention: bool = False,
        return_intermediate: bool = False,
        backbone_start_block: int = 0,
    ):
        """images: (B, H, W, 3) normalized NHWC; landmarks: (B, 5, 2).

        ``backbone_start_block > 0``: ``images`` is instead the input
        activation of that flat backbone block — the fused Pallas kernels
        (``models/fused_backbone.py``) ran the earlier stages.
        """
        backbone = EfficientNetBackbone(
            variant=self.variant,
            dropout_rate=self.dropout_rate,
            freeze_bn=self.freeze_bn,
            dtype=self.dtype,
            name="backbone",
        )
        out = backbone(
            images, train=train, return_maps=True,
            return_intermediate=return_intermediate,
            start_block=backbone_start_block,
        )
        if return_intermediate:
            feature_maps, intermediates = out
        else:
            feature_maps, intermediates = out, None

        attention_map = None
        if self.use_attention:
            H, W = feature_maps.shape[1], feature_maps.shape[2]
            attention = HybridAttention(
                channels=self.feature_dim,
                feature_size=(H, W),
                use_landmark=self.use_landmark,
                use_spatial=self.use_spatial,
                use_channel=self.use_channel,
                dtype=self.dtype,
                name="attention",
            )
            if return_attention and landmarks is not None and self.use_landmark:
                attention_map = LandmarkAttention(feature_size=(H, W)).attention_map(
                    landmarks, (H, W)
                )
            feature_maps = attention(feature_maps, landmarks)

        features = jnp.mean(feature_maps, axis=(1, 2))  # global average pool
        features = nn.Dropout(self.dropout_rate, deterministic=not train)(features)

        extras: Dict[str, Any] = {}
        if return_attention:
            extras["attention_map"] = attention_map
        if return_intermediate:
            extras["intermediate"] = {
                f"block_{k}": jnp.mean(v, axis=(1, 2)) for k, v in (intermediates or {}).items()
            }
        if extras:
            return features, extras
        return features


class DeepfakeDetectionModel(nn.Module):
    """Full model: features + MLP head; returns (logits, features)."""

    num_classes: int = 2
    variant: str = "b4"
    pretrained: bool = True
    classifier_hidden_dims: Sequence[int] = (512, 128, 32)
    dropout_rate: float = 0.4
    feature_dropout_rate: float = 0.4
    freeze_bn: bool = False
    use_attention: bool = True
    use_landmark: bool = True
    use_spatial: bool = True
    use_channel: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_extractor = DeepfakeFeatureExtractor(
            variant=self.variant,
            pretrained=self.pretrained,
            freeze_bn=self.freeze_bn,
            dropout_rate=self.feature_dropout_rate,
            use_attention=self.use_attention,
            use_landmark=self.use_landmark,
            use_spatial=self.use_spatial,
            use_channel=self.use_channel,
            dtype=self.dtype,
        )
        layers = []
        for i, hidden in enumerate(self.classifier_hidden_dims):
            layers.append(
                _ClassifierBlock(
                    features=hidden,
                    dropout_rate=self.dropout_rate,
                    dtype=self.dtype,
                    name=f"head_{i}",
                )
            )
        self.head_blocks = layers
        self.final = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32, name="final"
        )

    def __call__(
        self,
        images: jnp.ndarray,
        landmarks: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_features: bool = False,
        backbone_start_block: int = 0,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        features = self.feature_extractor(
            images, landmarks, train=train,
            backbone_start_block=backbone_start_block,
        )
        x = features
        for block in self.head_blocks:
            x = block(x, train=train)
        logits = self.final(x).astype(jnp.float32)
        if return_features:
            return logits, features.astype(jnp.float32)
        return logits, None

    def predict(
        self,
        images: jnp.ndarray,
        landmarks: Optional[jnp.ndarray] = None,
        return_probs: bool = True,
    ) -> jnp.ndarray:
        logits, _ = self(images, landmarks, train=False)
        return jax.nn.softmax(logits, axis=-1) if return_probs else logits

    def embed(
        self,
        images: jnp.ndarray,
        landmarks: Optional[jnp.ndarray] = None,
        normalize: bool = True,
    ) -> jnp.ndarray:
        """L2-normalized embeddings (reference ``get_embedding``)."""
        features = self.feature_extractor(images, landmarks, train=False)
        if normalize:
            features = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)
        return features


class _ClassifierBlock(nn.Module):
    features: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32, name="dense")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


def create_model_from_config(model_cfg: Dict[str, Any], dtype: Any = jnp.float32):
    """Build the classifier from the model_config.yaml 'model' block.

    ``type: efficientnet`` (default) builds the flagship
    DeepfakeDetectionModel; ``type: vit`` builds the fallback ViT family
    (models/vit.py) — the reference's fallback submission path pairs an
    HF ViT with the dlib detector (task(less_cpu_intensive_ver).ipynb
    cell 15), and both models share the (images, landmarks, train) →
    (logits, features) apply contract, so the predictor/evaluator drive
    either from config alone."""
    if model_cfg.get("type", "efficientnet") == "vit":
        from .vit import ViTClassifier

        fe = model_cfg.get("feature_extractor", {})
        clf = model_cfg.get("classifier", {})
        return ViTClassifier(
            variant=fe.get("variant", "base16"),
            num_classes=clf.get("num_classes", 2),
            image_size=int(fe.get("image_size", 224)),
            dropout=float(fe.get("dropout_rate", 0.0)),
            dtype=dtype,
        )
    fe = model_cfg.get("feature_extractor", {})
    attn = fe.get("attention_config", {}) or {}
    clf = model_cfg.get("classifier", {})
    return DeepfakeDetectionModel(
        num_classes=clf.get("num_classes", 2),
        variant=fe.get("variant", "b4"),
        pretrained=fe.get("pretrained", True),
        classifier_hidden_dims=tuple(clf.get("hidden_dims", [512, 128, 32])),
        dropout_rate=clf.get("dropout_rate", 0.4),
        feature_dropout_rate=fe.get("dropout_rate", 0.4),
        freeze_bn=fe.get("freeze_bn", False),
        use_attention=fe.get("use_attention", True),
        use_landmark=attn.get("use_landmark", True),
        use_spatial=attn.get("use_spatial", True),
        use_channel=attn.get("use_channel", True),
        dtype=dtype,
    )
