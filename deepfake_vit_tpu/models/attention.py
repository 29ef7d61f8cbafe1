"""Hybrid attention modules (landmark + channel-SE + spatial-CBAM), NHWC.

Capability parity with reference
``src/feature_extraction/landmark_attention.py:13-310``:

- LandmarkAttention: σ=1.5 Gaussian bumps at 5 landmarks scaled from 224²
  to feature-map coords, learnable per-landmark weights (init ones(5)),
  batch-global max normalization, clamp [0.1, 1.0], multiplied into the map.
- ChannelAttention: SE with avg+max global pooling through a shared
  bias-free 2-layer MLP (reduction 16), summed then sigmoid.
- SpatialAttention: channel-mean ‖ channel-max → 7×7 bias-free conv → sigmoid.
- HybridAttention: fixed composition landmark → channel → spatial, each
  toggleable.

All modules take/return (B, H, W, C) so the elementwise scales fuse into the
surrounding convolution epilogues under XLA.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gaussian import landmark_gaussian_map


class LandmarkAttention(nn.Module):
    feature_size: Tuple[int, int] = (7, 7)
    sigma: float = 1.5
    learnable: bool = True
    input_size: float = 224.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_maps: jnp.ndarray, landmarks: jnp.ndarray) -> jnp.ndarray:
        """feature_maps: (B, H, W, C); landmarks: (B, 5, 2) in input-px coords."""
        if self.learnable:
            weights = self.param("attention_weights", nn.initializers.ones, (5,), jnp.float32)
        else:
            weights = jnp.ones((5,), jnp.float32)
        H, W = feature_maps.shape[1], feature_maps.shape[2]
        amap = landmark_gaussian_map(
            landmarks.astype(jnp.float32),
            (H, W),
            sigma=self.sigma,
            weights=weights,
            input_size=self.input_size,
            normalize="global_max",
            clip_range=(0.1, 1.0),
        )  # (B, 1, H, W)
        amap = jnp.transpose(amap, (0, 2, 3, 1)).astype(feature_maps.dtype)  # (B,H,W,1)
        return feature_maps * amap

    def attention_map(self, landmarks: jnp.ndarray, feature_size: Tuple[int, int]) -> jnp.ndarray:
        """High-res map for visualization (reference ``visualize_attention``)."""
        return landmark_gaussian_map(
            landmarks, feature_size, sigma=self.sigma, input_size=self.input_size
        )


class ChannelAttention(nn.Module):
    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C)."""
        dense_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        hidden = self.channels // self.reduction
        fc1 = nn.Dense(hidden, name="fc1", **dense_kw)
        fc2 = nn.Dense(self.channels, name="fc2", **dense_kw)

        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        shared = lambda v: fc2(nn.relu(fc1(v)))  # noqa: E731 — shared-MLP contract
        scale = jax.nn.sigmoid(shared(avg) + shared(mx))  # (B, C)
        return x * scale[:, None, None, :].astype(x.dtype)


class SpatialAttention(nn.Module):
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C)."""
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        concat = jnp.concatenate([avg, mx], axis=-1)  # (B, H, W, 2)
        attn = nn.Conv(
            1,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(concat)
        return x * jax.nn.sigmoid(attn).astype(x.dtype)


class HybridAttention(nn.Module):
    channels: int
    feature_size: Tuple[int, int] = (7, 7)
    use_landmark: bool = True
    use_spatial: bool = True
    use_channel: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feature_maps: jnp.ndarray, landmarks: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        x = feature_maps
        if self.use_landmark and landmarks is not None:
            x = LandmarkAttention(
                feature_size=self.feature_size, dtype=self.dtype, name="landmark_attn"
            )(x, landmarks)
        if self.use_channel:
            x = ChannelAttention(
                channels=self.channels, dtype=self.dtype, name="channel_attn"
            )(x)
        if self.use_spatial:
            x = SpatialAttention(dtype=self.dtype, name="spatial_attn")(x)
        return x
