"""MTCNN-Lite: the second detector family (lightweight, P-Net-style convs).

The reference carries facenet-pytorch MTCNN as a real fallback detector
(``src/preprocessing/face_detector.py:12-192``); round 1 only degraded the
``model: "mtcnn"`` config key to SCRFD with a warning. This module honors
the *capability*: a genuinely lighter face detector built — in the MTCNN
P-Net spirit of very cheap convolutions — from depthwise-separable blocks
(~10× fewer FLOPs than the SCRFD-class net), trained in-framework on the
same (image, boxes, landmarks) data via ``scripts/train_detector.py
--model mtcnn``.

It is TPU-native where MTCNN is not: instead of the reference's 3-stage
image-pyramid cascade with per-stage host round-trips (dynamic-shape
hostile — each stage re-crops variable face counts), it emits the same
static multi-level {scores, bbox, kps} pyramid as ``ScrfdDetector``, so the
batched anchor decode, fixed-size NMS, and the whole ``FaceDetector`` host
API are shared unchanged. The cascade's coarse-to-fine refinement is
subsumed by the FPN levels; its landmark (O-Net) output by the per-anchor
landmark head.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import NUM_ANCHORS, STRIDES
from .scrfd import _upsample2


class _DsBlock(nn.Module):
    """Depthwise-separable conv block (depthwise 3×3 + pointwise 1×1)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        bn_kw = dict(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=self.dtype, param_dtype=jnp.float32)
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.Conv(cin, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=cin, name="dw", **conv_kw)(x)
        x = nn.BatchNorm(name="dw_bn", **bn_kw)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), name="pw", **conv_kw)(x)
        x = nn.BatchNorm(name="pw_bn", **bn_kw)(x)
        return nn.relu(x)


class MtcnnLiteDetector(nn.Module):
    """Lightweight multi-level detector with the ScrfdDetector output
    contract: per-stride dicts {'scores' (B, N), 'bbox' (B, N, 4),
    'kps' (B, N, 10)} at strides {8, 16, 32}."""

    widths: Sequence[int] = (16, 32, 48, 64)
    fpn_width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        x = images.astype(self.dtype)
        bn_kw = dict(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=self.dtype, param_dtype=jnp.float32)
        # Stem: stride 4, plain cheap convs (P-Net spirit).
        x = nn.Conv(self.widths[0], (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(x)
        x = nn.BatchNorm(name="stem_bn", **bn_kw)(x)
        x = nn.relu(x)
        x = _DsBlock(self.widths[0], stride=2, dtype=self.dtype, name="ds0")(x, train)

        feats = []
        for i, w in enumerate(self.widths[1:], start=1):
            x = _DsBlock(w, stride=2, dtype=self.dtype, name=f"ds{i}a")(x, train)
            x = _DsBlock(w, stride=1, dtype=self.dtype, name=f"ds{i}b")(x, train)
            feats.append(x)  # strides 8, 16, 32
        c3, c4, c5 = feats

        conv_kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)
        p5 = nn.Conv(self.fpn_width, (1, 1), name="lat5", **conv_kw)(c5)
        p4 = nn.Conv(self.fpn_width, (1, 1), name="lat4", **conv_kw)(c4) + _upsample2(p5)
        p3 = nn.Conv(self.fpn_width, (1, 1), name="lat3", **conv_kw)(c3) + _upsample2(p4)

        head = _LiteHead(self.fpn_width, dtype=self.dtype, name="head")
        return {
            stride: head(feat, train)
            for stride, feat in zip(STRIDES, (p3, p4, p5))
        }


class _LiteHead(nn.Module):
    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        B = x.shape[0]
        x = _DsBlock(self.width, stride=1, dtype=self.dtype, name="tower")(x, train)
        conv_kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)
        scores = nn.Conv(NUM_ANCHORS, (3, 3), padding="SAME", name="cls", **conv_kw)(x)
        bbox = nn.Conv(4 * NUM_ANCHORS, (3, 3), padding="SAME", name="box", **conv_kw)(x)
        kps = nn.Conv(10 * NUM_ANCHORS, (3, 3), padding="SAME", name="kps", **conv_kw)(x)
        return {
            "scores": scores.reshape(B, -1).astype(jnp.float32),
            "bbox": bbox.reshape(B, -1, 4).astype(jnp.float32),
            "kps": kps.reshape(B, -1, 10).astype(jnp.float32),
        }
