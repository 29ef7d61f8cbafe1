"""Stage-1 → Stage-2 in-memory interface.

Capability parity with reference ``src/data/interface.py:19-301``:
``FeatureExtractionInput`` (stacked images/landmarks/quality/labels/ids),
``PreprocessingToFeatureInterface.preprocessing_outputs_to_batch``,
landmark-attention-map construction, and the collate/device helpers. The
reference carried a near-copy of the Gaussian-map code here
(``interface.py:170-219`` duplicating ``landmark_attention.py:76-130``);
this build routes both callers through the single shared op
(:func:`deepfake_vit_tpu.ops.gaussian.landmark_gaussian_map`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import IMAGENET_MEAN, IMAGENET_STD, LABEL_MAP, collate_batch


@dataclass
class FeatureExtractionInput:
    """One model-ready batch (NHWC images, 5-pt landmarks)."""

    images: np.ndarray                     # (B, H, W, 3) float32 normalized
    landmarks: Optional[np.ndarray] = None  # (B, 5, 2)
    quality_scores: Optional[np.ndarray] = None  # (B,)
    labels: Optional[np.ndarray] = None    # (B,) int32, real=0/fake=1
    image_ids: List[str] = field(default_factory=list)
    batch_metadata: Dict[str, Any] = field(default_factory=dict)

    @property
    def batch_size(self) -> int:
        return int(self.images.shape[0])

    def to_device(self, mesh=None) -> Dict[str, Any]:
        """Place the numeric fields on device as a model batch dict."""
        import jax

        batch: Dict[str, Any] = {"image": self.images}
        if self.landmarks is not None:
            batch["landmarks"] = self.landmarks
        if self.labels is not None:
            batch["label"] = self.labels
        if self.quality_scores is not None:
            batch["quality_score"] = self.quality_scores
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            return shard_batch(batch, mesh)
        return {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}


class PreprocessingToFeatureInterface:
    """Bridges :class:`PreprocessingOutput` records to model batches."""

    def __init__(self, image_size: int = 224, normalize: bool = True):
        self.image_size = image_size
        self.normalize = normalize

    def preprocessing_outputs_to_batch(self, outputs: Sequence[Any]) -> FeatureExtractionInput:
        """Stack PreprocessingOutputs (reference ``interface.py:65-121``).

        Faces arrive uint8 RGB from the pipeline; they are scaled to [0,1]
        and ImageNet-normalized here so the output feeds the model as-is.
        """
        images = []
        landmarks = []
        qualities = []
        labels = []
        ids = []
        for out in outputs:
            raw = np.asarray(out.aligned_face)
            img = raw.astype(np.float32)
            # Branch on dtype, not per-image max: a uniformly dark uint8
            # face (all pixels <= 1) must still be /255-rescaled.
            if np.issubdtype(raw.dtype, np.integer) or img.max() > 1.5:
                img = img / 255.0
            if self.normalize:
                img = (img - IMAGENET_MEAN) / IMAGENET_STD
            images.append(img)
            landmarks.append(
                np.asarray(out.landmarks, dtype=np.float32)
                if out.landmarks is not None
                else np.zeros((5, 2), dtype=np.float32)
            )
            qualities.append(float(out.quality_score))
            labels.append(LABEL_MAP.get(str(out.label), 0))
            ids.append(str(out.image_id))
        return FeatureExtractionInput(
            images=np.stack(images),
            landmarks=np.stack(landmarks),
            quality_scores=np.array(qualities, dtype=np.float32),
            labels=np.array(labels, dtype=np.int32),
            image_ids=ids,
            batch_metadata={"count": len(outputs)},
        )

    def dataloader_batch_to_feature_input(self, batch: Dict[str, Any]) -> FeatureExtractionInput:
        """Adapt a HostLoader batch dict (reference ``interface.py:123-143``)."""
        return FeatureExtractionInput(
            images=np.asarray(batch["image"], dtype=np.float32),
            landmarks=np.asarray(batch["landmarks"], dtype=np.float32)
            if "landmarks" in batch
            else None,
            quality_scores=np.asarray(batch.get("quality_score"), dtype=np.float32)
            if "quality_score" in batch
            else None,
            labels=np.asarray(batch["label"], dtype=np.int32) if "label" in batch else None,
            image_ids=list(batch.get("image_id", [])),
        )

    def create_landmark_attention_maps(
        self,
        landmarks: np.ndarray,
        feature_size: Tuple[int, int],
        sigma: float = 1.5,
        input_size: float = 224.0,
    ) -> np.ndarray:
        """(B, 1, H, W) Gaussian maps, per-sample max-normalized.

        The reference interface variant (``interface.py:170-219``) uses
        σ=1.5 with per-map max normalization and no clamping — distinct
        from the learnable module's global-max + clamp [0.1, 1.0].
        """
        from ..ops.gaussian import landmark_gaussian_map

        maps = landmark_gaussian_map(
            np.asarray(landmarks, dtype=np.float32),
            feature_size,
            sigma=sigma,
            input_size=input_size,
            normalize="per_sample",
            clip_range=None,
        )
        return np.asarray(maps)

    def prepare_for_efficientnet(self, fe: FeatureExtractionInput, mesh=None) -> Dict[str, Any]:
        """Device placement (reference ``interface.py:145-168``)."""
        return fe.to_device(mesh=mesh)


def batch_to_device(batch: Dict[str, Any], mesh=None) -> Dict[str, Any]:
    """Move a host batch's numeric leaves to device (reference
    ``interface.py:270-287``), sharded over the mesh when given."""
    import jax

    numeric = {
        k: np.asarray(v)
        for k, v in batch.items()
        if not isinstance(v, (list, dict)) and np.asarray(v).dtype.kind in "fiub"
    }
    if mesh is not None:
        from ..parallel.mesh import shard_batch

        return shard_batch(numeric, mesh)
    return {k: jax.device_put(v) for k, v in numeric.items()}


def collate_preprocessing_outputs(outputs: Sequence[Any]) -> FeatureExtractionInput:
    """Custom collate_fn equivalent (reference ``interface.py:290-301``)."""
    return PreprocessingToFeatureInterface().preprocessing_outputs_to_batch(outputs)


__all__ = [
    "FeatureExtractionInput",
    "PreprocessingToFeatureInterface",
    "batch_to_device",
    "collate_batch",
    "collate_preprocessing_outputs",
]
