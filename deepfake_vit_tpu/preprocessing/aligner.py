"""Face alignment (Stage 1).

Capability parity with reference ``src/preprocessing/face_aligner.py``:
5-point landmark alignment to a 224×224 template (eyes y=0.32 at
x=0.31/0.69, nose (0.50, 0.55), mouth y=0.75 at x=0.35/0.65), 'similarity'
(Umeyama) or 'affine' (first-3-points) estimation, aligned-landmark
transform, alignment-quality scoring (IED-normalized distances to the
template), and the ImageNet NormalizationProcessor.

TPU-native: the estimate + warp run as batched XLA ops
(``ops.umeyama`` + ``ops.warp``) over whole face batches; the reference's
``align_batch`` Python loop (``face_aligner.py:161-180``) becomes one jit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.umeyama import affine_from_3pts, transform_points, umeyama
from ..ops.warp import warp_affine_auto

DEFAULT_REFERENCE_LANDMARKS = {
    "left_eye": (0.31, 0.32),
    "right_eye": (0.69, 0.32),
    "nose": (0.50, 0.55),
    "left_mouth": (0.35, 0.75),
    "right_mouth": (0.65, 0.75),
}
_LANDMARK_ORDER = ("left_eye", "right_eye", "nose", "left_mouth", "right_mouth")


class FaceAligner:
    def __init__(
        self,
        output_size: Tuple[int, int] = (224, 224),
        reference_landmarks: Optional[Dict[str, Tuple[float, float]]] = None,
        method: str = "similarity",
        border_value: float = 0.0,
        warp_window: Optional[int] = None,
        warp_fractional: bool = True,
    ):
        self.output_size = tuple(output_size)
        # Serving-matched warp: when set, sources larger than `warp_window`
        # are cropped/resampled through the windowed warp the serving
        # FusedPipeline uses (ops/warp.py::warp_affine_windowed) instead of
        # the exact full-frame warp — so offline-preprocessed crops carry
        # the SAME fidelity profile the online path produces. This is the
        # knob the paired-seed warp-window A/B (scripts/
        # experiment_pipeline_ab.py) turns. None (default) = exact warp.
        self.warp_window = int(warp_window) if warp_window else None
        self.warp_fractional = bool(warp_fractional)
        ref = {**DEFAULT_REFERENCE_LANDMARKS, **(reference_landmarks or {})}
        # Normalized template coords → absolute output pixels.
        self.reference = np.asarray(
            [ref[k] for k in _LANDMARK_ORDER], dtype=np.float32
        ) * np.asarray([self.output_size[1], self.output_size[0]], dtype=np.float32)
        if method not in ("similarity", "affine"):
            raise ValueError(f"unknown alignment method: {method}")
        self.method = method
        self.border_value = border_value
        self._align_jit = jax.jit(self._align_graph)
        # uint8-output variant: clip + truncate on DEVICE so the aligned
        # faces come home over the (slow) link at 1 byte/px instead of 4.
        # float->uint8 conversion truncates toward zero in both XLA and
        # numpy, so this matches np.clip(x, 0, 255).astype(np.uint8).
        self._align_jit_u8 = jax.jit(
            lambda im, lm: (lambda a, al, tf: (
                jnp.clip(a, 0.0, 255.0).astype(jnp.uint8), al, tf
            ))(*self._align_graph(im, lm))
        )

    # -- jitted core -------------------------------------------------------
    def _estimate(self, landmarks: jnp.ndarray) -> jnp.ndarray:
        ref = jnp.asarray(self.reference)
        if self.method == "similarity":
            return umeyama(landmarks, jnp.broadcast_to(ref, landmarks.shape))
        return affine_from_3pts(
            landmarks[..., :3, :], jnp.broadcast_to(ref[:3], landmarks[..., :3, :].shape)
        )

    def _align_graph(self, images: jnp.ndarray, landmarks: jnp.ndarray):
        """images (B, H, W, 3) uint8/float; landmarks (B, 5, 2) source pixels."""
        images = images.astype(jnp.float32)
        tform = self._estimate(landmarks)
        use_windowed = (
            self.warp_window is not None
            and self.border_value == 0.0
            and min(images.shape[1], images.shape[2]) >= self.warp_window
            and images.shape[1] % 8 == 0
            and self.warp_window % 8 == 0
        )
        if use_windowed:
            from ..ops.warp import warp_affine_windowed

            aligned = warp_affine_windowed(
                images, tform, self.output_size,
                window=self.warp_window, fractional=self.warp_fractional,
            )
        elif self.border_value == 0.0:
            aligned = warp_affine_auto(images, tform, self.output_size)
        else:  # non-zero border: only the gather path supports it
            from ..ops.warp import warp_affine

            aligned = warp_affine(images, tform, self.output_size, self.border_value)
        aligned_landmarks = transform_points(tform, landmarks)
        return aligned, aligned_landmarks, tform

    # -- host API ----------------------------------------------------------
    def align(
        self, image: np.ndarray, landmarks: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Single-face align → (aligned_image, tform 2×3)."""
        aligned, _, tform = self._align_jit(
            jnp.asarray(image, jnp.float32)[None], jnp.asarray(landmarks, jnp.float32)[None]
        )
        return np.asarray(aligned[0]), np.asarray(tform[0])

    def align_batch(
        self, images: np.ndarray, landmarks: np.ndarray, out_uint8: bool = False
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched align: (B,H,W,3), (B,5,2) → aligned, aligned_lms, tforms.

        ``images`` may be a host array (uint8 or float — uint8 rides the
        host→device link 4× lighter; the f32 cast happens on device) or an
        array already on device (no transfer). ``out_uint8`` clips/casts the
        aligned faces to uint8 ON DEVICE before the device→host pull.
        """
        fn = self._align_jit_u8 if out_uint8 else self._align_jit
        aligned, alms, tforms = fn(
            jnp.asarray(images), jnp.asarray(landmarks, jnp.float32)
        )
        return np.asarray(aligned), np.asarray(alms), np.asarray(tforms)

    def get_aligned_landmarks(self, landmarks: np.ndarray, tform: np.ndarray) -> np.ndarray:
        """Homogeneous transform of landmarks by a 2×3 matrix."""
        return np.asarray(
            transform_points(jnp.asarray(tform)[None], jnp.asarray(landmarks, jnp.float32)[None])[0]
        )

    def compute_alignment_quality(self, aligned_landmarks: np.ndarray) -> float:
        """IED-normalized mean distance to the reference template → [0, 1]."""
        ied = np.linalg.norm(self.reference[1] - self.reference[0])
        dists = np.linalg.norm(aligned_landmarks - self.reference, axis=-1)
        return float(max(0.0, 1.0 - dists.mean() / max(ied, 1e-6)))


class NormalizationProcessor:
    """ImageNet normalize/denormalize (reference ``face_aligner.py:284-340``)."""

    def __init__(
        self,
        mean: Tuple[float, float, float] = (0.485, 0.456, 0.406),
        std: Tuple[float, float, float] = (0.229, 0.224, 0.225),
    ):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def normalize(self, image: np.ndarray) -> np.ndarray:
        """uint8/float [0,255] or [0,1] RGB → normalized float32."""
        img = np.asarray(image, dtype=np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        return (img - self.mean) / self.std

    def denormalize(self, image: np.ndarray, to_uint8: bool = False) -> np.ndarray:
        img = np.asarray(image, dtype=np.float32) * self.std + self.mean
        img = np.clip(img, 0.0, 1.0)
        return (img * 255.0).astype(np.uint8) if to_uint8 else img
