"""Landmark Gaussian attention maps as a batched XLA op.

Re-provides the map construction of the reference
(`src/feature_extraction/landmark_attention.py:76-130` and its unweighted
twin `src/data/interface.py:170-219`) as one vectorized function: no
per-landmark Python loop over tensors of batch size — a single broadcasted
expression XLA fuses into a handful of VPU ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def landmark_gaussian_map(
    landmarks: jnp.ndarray,
    feature_size: Tuple[int, int],
    sigma: float = 1.5,
    weights: Optional[jnp.ndarray] = None,
    input_size: float = 224.0,
    normalize: str = "global_max",
    clip_range: Optional[Tuple[float, float]] = (0.1, 1.0),
) -> jnp.ndarray:
    """Sum-of-Gaussians attention map from 5-point landmarks.

    Args:
        landmarks: (B, 5, 2) landmark (x, y) in ``input_size`` pixel coords.
        feature_size: (H, W) of the target feature map.
        sigma: Gaussian stddev in feature-map pixels.
        weights: optional (5,) per-landmark weights (learnable in the module).
        input_size: coordinate scale of the landmarks (224 for aligned faces).
        normalize: 'global_max' (max over the whole batch, the reference's
            semantics — induces a cheap all-reduce max under data sharding),
            'per_sample' (max per example), or 'none'.
        clip_range: (min, max) clamp so background keeps some weight.

    Returns:
        (B, 1, H, W)-shaped map broadcastable over channels in NCHW, or use
        ``[..., None]`` transposes for NHWC callers.
    """
    H, W = feature_size
    B = landmarks.shape[0]
    dtype = landmarks.dtype if jnp.issubdtype(landmarks.dtype, jnp.floating) else jnp.float32
    landmarks = landmarks.astype(dtype)

    scale = jnp.asarray([W / input_size, H / input_size], dtype=dtype)
    lm = landmarks * scale  # (B, 5, 2) in feature-map coords

    ys = jnp.arange(H, dtype=dtype)
    xs = jnp.arange(W, dtype=dtype)
    # (B, 5, H, W) squared distances, fully broadcast — no Python loop.
    dy = ys[None, None, :, None] - lm[:, :, 1][:, :, None, None]
    dx = xs[None, None, None, :] - lm[:, :, 0][:, :, None, None]
    dist_sq = dx * dx + dy * dy
    gauss = jnp.exp(-dist_sq / (2.0 * sigma * sigma))

    if weights is not None:
        gauss = gauss * weights.astype(dtype)[None, :, None, None]
    amap = jnp.sum(gauss, axis=1, keepdims=True)  # (B, 1, H, W)

    if normalize == "global_max":
        amap = amap / (jnp.max(amap) + 1e-8)
    elif normalize == "per_sample":
        amap = amap / (jnp.max(amap, axis=(1, 2, 3), keepdims=True) + 1e-8)
    elif normalize != "none":
        raise ValueError(f"unknown normalize mode: {normalize}")

    if clip_range is not None:
        amap = jnp.clip(amap, clip_range[0], clip_range[1])
    return amap
