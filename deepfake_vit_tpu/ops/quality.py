"""Fused, batched face-quality scoring.

Capability parity with reference ``src/preprocessing/quality_checker.py``
(5 checks + weighted overall score), recomputed as one jitted graph over a
whole batch of faces instead of five sequential cv2 passes per image:

- face size: min(bbox side) within [min_face_size, max_face_size]
- blur: Laplacian variance ≥ blur_threshold (reflect-101 border)
- brightness: gray mean ∈ [min_brightness, max_brightness]
- contrast: gray std ≥ min_contrast
- occlusion: mean variance of 5 landmark-centered patches (size
  min(H,W)//10, windows clipped at borders exactly as the reference clips)
  / 1000, clipped to [0,1], ≥ occlusion_threshold — computed via
  interval-hot matmuls (see _patch_variance_batch).
- detection confidence passes through.

Per-metric normalization and the fixed weight vector
{size .15, blur .25, brightness .15, contrast .15, occlusion .15,
conf .15} match ``quality_checker.py:111-118, 260-304``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .image import laplacian, rgb_to_gray

DEFAULT_THRESHOLDS = dict(
    min_face_size=50.0,
    max_face_size=2000.0,
    blur_threshold=100.0,
    min_brightness=30.0,
    max_brightness=225.0,
    min_contrast=20.0,
    occlusion_threshold=0.3,
)

QUALITY_WEIGHTS = dict(
    face_size=0.15,
    blur=0.25,
    brightness=0.15,
    contrast=0.15,
    occlusion=0.15,
    detection_confidence=0.15,
)


def _patch_variance(gray: jnp.ndarray, landmarks: jnp.ndarray, region: int) -> jnp.ndarray:
    """Mean variance of region-sized patches centered at the 5 landmarks.

    Interval-hot matmul formulation: each clipped window sum is
    R[k]·gray·C[k]ᵀ with R/C 0-1 row/column interval indicators built from
    iota — two tiny MXU contractions for the whole batch, no per-landmark
    dynamic slices (slow gathers on TPU) and no 2-axis cumsum scans (the
    integral-image route's sequential passes cost more than the matmuls at
    batch scale). Windows are CLIPPED at image borders with the true pixel
    count in the denominator, exactly the reference's semantics
    (quality_checker.py:227-246).
    """
    return _patch_variance_batch(gray[None], landmarks[None], region)[0]


def _patch_variance_batch(
    gray: jnp.ndarray, landmarks: jnp.ndarray, region: int
) -> jnp.ndarray:
    """Batched patch variance: gray (B, H, W), landmarks (B, 5, 2) → (B,)."""
    B, H, W = gray.shape
    half = region // 2
    x = landmarks[..., 0].astype(jnp.int32)  # (B, 5)
    y = landmarks[..., 1].astype(jnp.int32)
    x1 = jnp.clip(x - half, 0, W)
    y1 = jnp.clip(y - half, 0, H)
    x2 = jnp.clip(x + half, 0, W)
    y2 = jnp.clip(y + half, 0, H)

    ii = jnp.arange(H, dtype=jnp.int32)
    jj = jnp.arange(W, dtype=jnp.int32)
    R = ((ii >= y1[..., None]) & (ii < y2[..., None])).astype(gray.dtype)  # (B,5,H)
    Cm = ((jj >= x1[..., None]) & (jj < x2[..., None])).astype(gray.dtype)  # (B,5,W)

    T1 = jnp.einsum("bkh,bhw->bkw", R, gray)
    T2 = jnp.einsum("bkh,bhw->bkw", R, gray * gray)
    s1 = jnp.sum(T1 * Cm, axis=-1)  # (B, 5)
    s2 = jnp.sum(T2 * Cm, axis=-1)

    area = (x2 - x1) * (y2 - y1)
    n = jnp.maximum(area, 1).astype(gray.dtype)
    mean = s1 / n
    var = s2 / n - mean * mean
    # Empty windows (landmark fully outside) contribute 0 like the reference
    # skips them; keep the mean over the 5 landmarks.
    var = jnp.where(area > 0, var, 0.0)
    return jnp.mean(var, axis=-1)


def quality_scores(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    bboxes: jnp.ndarray,
    confidences: jnp.ndarray,
    thresholds: Dict[str, float] | None = None,
) -> Dict[str, jnp.ndarray]:
    """Raw per-metric scores + validity for a batch.

    images: (B, H, W, 3) float RGB in [0, 255] (uint8 range, matching cv2
        semantics of the reference — pass aligned uint8 faces as float).
    landmarks: (B, 5, 2) pixels; bboxes: (B, 4) xyxy; confidences: (B,).
    """
    th = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    gray = rgb_to_gray(images.astype(jnp.float32))  # (B, H, W)
    B, H, W = gray.shape

    lap = laplacian(gray)
    blur = jnp.var(lap, axis=(1, 2))
    brightness = jnp.mean(gray, axis=(1, 2))
    contrast = jnp.std(gray, axis=(1, 2))

    region = max(min(H, W) // 10, 2)
    occ_var = _patch_variance_batch(gray, landmarks, region)
    occlusion = jnp.minimum(occ_var / 1000.0, 1.0)

    w = bboxes[:, 2] - bboxes[:, 0]
    h = bboxes[:, 3] - bboxes[:, 1]
    face_size = jnp.minimum(w, h)

    valid = (
        (face_size >= th["min_face_size"])
        & (face_size <= th["max_face_size"])
        & (blur >= th["blur_threshold"])
        & (brightness >= th["min_brightness"])
        & (brightness <= th["max_brightness"])
        & (contrast >= th["min_contrast"])
        & (occlusion >= th["occlusion_threshold"])
    )

    return {
        "face_size": face_size,
        "blur": blur,
        "brightness": brightness,
        "contrast": contrast,
        "occlusion": occlusion,
        "detection_confidence": confidences,
        "is_valid": valid,
    }


def normalize_scores(scores: Dict[str, jnp.ndarray], thresholds: Dict[str, float] | None = None) -> Dict[str, jnp.ndarray]:
    """Per-metric [0,1] normalization (quality_checker.py:260-304 semantics)."""
    th = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    out = {}

    fs = scores["face_size"]
    out["face_size"] = jnp.where(
        fs < 100.0,
        fs / 100.0,
        jnp.where(fs > 500.0, jnp.maximum(0.0, 1.0 - (fs - 500.0) / 500.0), 1.0),
    )
    out["blur"] = jnp.minimum(scores["blur"] / (th["blur_threshold"] * 2.0), 1.0)
    out["brightness"] = jnp.maximum(0.0, 1.0 - jnp.abs(scores["brightness"] - 127.5) / 127.5)
    out["contrast"] = jnp.minimum(scores["contrast"] / (th["min_contrast"] * 5.0), 1.0)
    out["occlusion"] = scores["occlusion"]
    out["detection_confidence"] = scores["detection_confidence"]
    return out


def overall_quality(
    images: jnp.ndarray,
    landmarks: jnp.ndarray,
    bboxes: jnp.ndarray,
    confidences: jnp.ndarray,
    thresholds: Dict[str, float] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Fused overall score: (overall (B,), is_valid (B,), raw scores dict)."""
    raw = quality_scores(images, landmarks, bboxes, confidences, thresholds)
    norm = normalize_scores(raw, thresholds)
    overall = sum(QUALITY_WEIGHTS[k] * norm[k] for k in QUALITY_WEIGHTS)
    return overall, raw["is_valid"], raw


overall_quality_jit = jax.jit(overall_quality)
