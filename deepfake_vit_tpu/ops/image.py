"""Batched image primitives (grayscale, Laplacian, resize, normalize).

Replaces the reference's per-image OpenCV calls (``quality_checker.py``,
``dataset.py:82-88``) with batched XLA expressions: one fused graph over
(B, H, W, C) instead of a Python loop of cv2 calls.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# ITU-R BT.601 luma weights — cv2.COLOR_RGB2GRAY semantics.
_LUMA = (0.299, 0.587, 0.114)

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)


def rgb_to_gray(images: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) float → (..., H, W) luma, cv2 RGB2GRAY weights."""
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    return _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b


def laplacian(gray: jnp.ndarray) -> jnp.ndarray:
    """3×3 Laplacian with reflect-101 border (cv2.Laplacian defaults).

    gray: (B, H, W) → (B, H, W).
    """
    x = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    center = x[:, 1:-1, 1:-1]
    up = x[:, :-2, 1:-1]
    down = x[:, 2:, 1:-1]
    left = x[:, 1:-1, :-2]
    right = x[:, 1:-1, 2:]
    return up + down + left + right - 4.0 * center


def normalize_imagenet(images: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] RGB → ImageNet-normalized."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_imagenet(images: jnp.ndarray) -> jnp.ndarray:
    return images * IMAGENET_STD + IMAGENET_MEAN


def resize_bilinear(images: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Batched bilinear resize (XLA-native)."""
    B = images.shape[0]
    C = images.shape[-1]
    return jax.image.resize(images, (B, out_hw[0], out_hw[1], C), method="bilinear")
