"""SCRFD/RetinaFace-class anchor-center generation and decode.

Re-provides the anchor decode + landmark regression the reference consumes
from InsightFace's ONNX graph (``face_detector.py:195-276``) as explicit
batched XLA ops: distance-to-sides box decode and 5-point keypoint offsets
at anchor centers over strides {8, 16, 32} with 2 anchors per location
(the SCRFD det_10g layout used by buffalo_l).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2


@lru_cache(maxsize=16)
def anchor_centers(input_size: Tuple[int, int], strides: Sequence[int] = STRIDES,
                   num_anchors: int = NUM_ANCHORS) -> Dict[int, np.ndarray]:
    """Per-stride anchor center grids: {stride: (H/s * W/s * A, 2)} in pixels."""
    H, W = input_size
    out = {}
    for s in strides:
        h, w = H // s, W // s
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        centers = np.stack([xs, ys], axis=-1).astype(np.float32) * s
        centers = centers.reshape(-1, 2)
        centers = np.repeat(centers, num_anchors, axis=0)
        out[s] = centers
    return out


def all_anchor_centers(input_size: Tuple[int, int]) -> np.ndarray:
    """Concatenated centers across strides, plus per-row stride array."""
    per = anchor_centers(input_size)
    centers = np.concatenate([per[s] for s in STRIDES], axis=0)
    strides = np.concatenate(
        [np.full((per[s].shape[0],), s, np.float32) for s in STRIDES]
    )
    return centers, strides


def decode_boxes(centers: jnp.ndarray, strides: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Distance decode: dist (..., N, 4) = (l, t, r, b) in stride units → xyxy."""
    d = dist * strides[..., None]
    x1 = centers[..., 0] - d[..., 0]
    y1 = centers[..., 1] - d[..., 1]
    x2 = centers[..., 0] + d[..., 2]
    y2 = centers[..., 1] + d[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def decode_landmarks(centers: jnp.ndarray, strides: jnp.ndarray, kps: jnp.ndarray) -> jnp.ndarray:
    """Keypoint decode: kps (..., N, 10) offsets in stride units → (..., N, 5, 2)."""
    k = kps.reshape(kps.shape[:-1] + (5, 2)) * strides[..., None, None]
    return k + centers[..., None, :]
