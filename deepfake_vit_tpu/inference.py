"""End-to-end inference: detect → align → classify.

Capability parity with the reference notebook path (``task.ipynb`` cell 16
``preprocess_frame`` / ``predict_single_file``): all detected frames of a
file are classified in one batched forward; the clip-level decision is the
mean fake-probability thresholded at 0.5; detection failure → real.

TPU-native: the classify step is one jitted program; frames are padded to a
static batch so video clips of any length reuse the same executable.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataset import IMAGENET_MEAN, IMAGENET_STD
from .models import create_model_from_config
from .preprocessing import FaceAligner, create_face_detector
from .training import TrainState, create_optimizer, restore_train_state
from .utils import load_checkpoint


class DeepfakePredictor:
    def __init__(
        self,
        model_config: Dict[str, Any],
        preprocessing_config: Dict[str, Any],
        checkpoint_path: Optional[str] = None,
        state: Optional[TrainState] = None,
        frame_count: int = 5,
        threshold: float = 0.5,
        max_batch: int = 32,
        dtype=jnp.bfloat16,
    ):
        self.frame_count = frame_count
        self.threshold = threshold
        self.max_batch = max_batch

        self.detector = create_face_detector(preprocessing_config.get("detection", {}))
        align_cfg = preprocessing_config.get("alignment", {})
        self.aligner = FaceAligner(
            output_size=tuple(align_cfg.get("output_size", (224, 224))),
            reference_landmarks=align_cfg.get("reference_landmarks"),
            method=align_cfg.get("method", "similarity"),
        )

        self.model = create_model_from_config(model_config.get("model", {}), dtype=dtype)
        size = tuple(align_cfg.get("output_size", (224, 224)))
        dummy_img = jnp.zeros((1, *size, 3), jnp.float32)
        dummy_lms = jnp.zeros((1, 5, 2), jnp.float32)
        rng = jax.random.PRNGKey(0)
        variables = self.model.init({"params": rng, "dropout": rng}, dummy_img, dummy_lms)
        # The ViT fallback family carries no BatchNorm state.
        variables = dict(variables)
        variables.setdefault("batch_stats", {})

        if state is not None:
            self.state = state
        else:
            optimizer = create_optimizer({"type": "AdamW", "lr": 1e-4})
            template = TrainState.create(
                variables["params"], variables["batch_stats"],
                optimizer.init(variables["params"]),
            )
            if checkpoint_path:
                self.state = restore_train_state(
                    template, load_checkpoint(checkpoint_path), restore_opt=False
                )
            else:
                self.state = template

        self._predict_jit = jax.jit(self._predict_graph)

    @classmethod
    def from_packaged(
        cls,
        weights_path: str,
        preprocessing_config: Dict[str, Any],
        **kwargs,
    ) -> "DeepfakePredictor":
        """Build a predictor from a self-describing packaged classifier.

        The file (``scripts/package_classifier.py`` →
        ``scripts/promote_weights.py --model classifier``) embeds the model
        config and trained face size, so the predictor rebuilds the exact
        trained architecture regardless of the caller's YAML — the
        out-of-the-box replacement for the reference's external
        ``best_model.pth`` (``task.ipynb`` cell 16).
        """
        packaged = load_checkpoint(weights_path)
        if packaged.get("format") != "dfv-classifier-v1":
            raise ValueError(
                f"{weights_path} is not a packaged classifier "
                f"(format={packaged.get('format')!r})"
            )
        face = int(packaged.get("face_size", 224))
        pre = dict(preprocessing_config)
        pre["alignment"] = {
            **preprocessing_config.get("alignment", {}),
            "output_size": [face, face],
        }
        self = cls({"model": packaged["model_config"]}, pre, **kwargs)
        self.state = restore_train_state(self.state, packaged, restore_opt=False)
        return self

    def _predict_graph(self, params, batch_stats, images, landmarks, mask):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, _ = self.model.apply(variables, images, landmarks, train=False)
        probs = jax.nn.softmax(logits, axis=-1)
        fake = probs[:, 1]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        mean_fake = jnp.sum(fake * mask) / denom
        return fake, mean_fake

    # ------------------------------------------------------------------
    def preprocess_frame(self, rgb: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
        """detect → align → normalized model input (None if no face)."""
        det = self.detector.detect(rgb)
        if det is None:
            return None
        aligned, tform = self.aligner.align(rgb.astype(np.float32), det["landmarks"])
        aligned_lms = self.aligner.get_aligned_landmarks(det["landmarks"], tform)
        img = np.clip(aligned, 0, 255) / 255.0
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        return {"image": img.astype(np.float32), "landmarks": aligned_lms.astype(np.float32)}

    def predict_frames(self, frames: Sequence[np.ndarray]) -> Dict[str, Any]:
        """Frames of one file → clip-level {label, fake_prob, per-frame probs}."""
        # Batched detection over all frames at once.
        detections = self.detector.batch_detect(list(frames))
        hits = [
            (np.asarray(rgb, np.float32), det)
            for rgb, det in zip(frames, detections)
            if det is not None
        ]
        if not hits:
            return {"label": 0, "fake_prob": 0.0, "frame_probs": [], "num_faces": 0}

        # Batched alignment: one align_batch call when the detected frames
        # share a shape (the video case — all clip frames are equal-sized);
        # mixed-shape inputs fall back to per-shape groups.
        aligned_parts: List[np.ndarray] = []
        lms_parts: List[np.ndarray] = []
        i = 0
        while i < len(hits):
            j = i + 1
            while j < len(hits) and hits[j][0].shape == hits[i][0].shape:
                j += 1
            imgs = np.stack([h[0] for h in hits[i:j]])
            src_lms = np.stack(
                [np.asarray(h[1]["landmarks"], np.float32) for h in hits[i:j]]
            )
            aligned, aligned_lms, _ = self.aligner.align_batch(imgs, src_lms)
            aligned_parts.append(aligned)
            lms_parts.append(aligned_lms)
            i = j
        aligned_all = np.concatenate(aligned_parts)
        images = (np.clip(aligned_all, 0, 255) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        images = images.astype(np.float32)
        lms = np.concatenate(lms_parts).astype(np.float32)

        # Pad to the static batch size so every clip reuses one executable.
        n = len(hits)
        pad = self.max_batch - (n % self.max_batch or self.max_batch)
        mask = np.ones(n, np.float32)
        if pad:
            images = np.concatenate([images, np.zeros((pad, *images.shape[1:]), np.float32)])
            lms = np.concatenate([lms, np.zeros((pad, 5, 2), np.float32)])
            mask = np.concatenate([mask, np.zeros(pad, np.float32)])

        fake, mean_fake = self._predict_jit(
            self.state.params, self.state.batch_stats,
            jnp.asarray(images), jnp.asarray(lms), jnp.asarray(mask),
        )
        mean_fake = float(mean_fake)
        return {
            "label": int(mean_fake >= self.threshold),
            "fake_prob": mean_fake,
            "frame_probs": np.asarray(fake)[:n].tolist(),
            "num_faces": n,
        }

    def predict_image(self, rgb: np.ndarray) -> Dict[str, Any]:
        return self.predict_frames([rgb])
