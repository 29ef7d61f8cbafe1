"""SCRFD-style face detector in flax (NHWC) — the TPU-native replacement
for the reference's InsightFace ``buffalo_l`` RetinaFace/SCRFD ONNX session
(``src/preprocessing/face_detector.py:195-276``).

Architecture: a residual backbone (C3/C4/C5) → FPN neck → per-level shared
head emitting, at strides {8, 16, 32} with 2 anchors per location:
objectness scores (A), distance-to-sides box regression (4A), and 5-point
landmark offsets (10A). Decoding (``ops.anchors``) and fixed-size NMS
(``ops.nms``) are separate batched XLA ops so the whole detect path jits
into one program with static shapes.

Weights: train in-framework or convert externally; the graph matches the
det_10g output layout so converted SCRFD weights drop in per-level.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import NUM_ANCHORS, STRIDES


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    # fold_pool=p > 1: this conv ABSORBS a preceding p× average pool
    # exactly — kernel p·k, stride p·s, explicit (0, p·pad_r) padding, and
    # weights expanded by fold_stem_pool_params. Serving uses it to feed the
    # detector full-resolution frames with zero pooling pass (the XLA NHWC
    # C=3 pool ran at 3/128 lane utilization, ~8 ms at B=128·640²).
    fold_pool: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.fold_pool
        if p == 1:
            padding = "SAME"
        else:
            # TF-SAME of the pooled k3-s2 conv (pad (0,1) at even sizes)
            # maps to (0, p) zeros on the original resolution: pooled pad
            # column c spans p original columns.
            padding = ((0, p), (0, p))
        x = nn.Conv(
            self.features,
            (self.kernel * p, self.kernel * p),
            strides=(self.stride * p, self.stride * p),
            padding=padding,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return nn.relu(x)


class _ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = _ConvBN(self.features, 3, self.stride, dtype=self.dtype)(x, train)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    param_dtype=jnp.float32)(residual)
        return nn.relu(y + residual)


class ScrfdDetector(nn.Module):
    """Multi-level face detection network.

    ``__call__(images, train)`` with images (B, H, W, 3) normalized
    ((x-127.5)/128, the SCRFD convention) returns per-level dicts
    {'scores': (B, N_l), 'bbox': (B, N_l, 4), 'kps': (B, N_l, 10)} where
    N_l = (H/s)(W/s)·A, flattened row-major then anchor — the layout
    ``ops.anchors.all_anchor_centers`` generates.
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    blocks_per_stage: Sequence[int] = (2, 2, 2, 2)
    fpn_width: int = 64
    head_width: int = 64
    head_depth: int = 2
    dtype: Any = jnp.float32
    # stem_pool=p > 1: the first stem conv absorbs a p× average pool, so
    # __call__ takes p·input_size frames and produces identical outputs to
    # pool-then-detect (weights via fold_stem_pool_params).
    stem_pool: int = 1

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        x = images.astype(self.dtype)
        # Stem: stride 4 (× stem_pool when the first conv folds a pool)
        x = _ConvBN(self.widths[0], 3, 2, dtype=self.dtype,
                    fold_pool=self.stem_pool)(x, train)
        x = _ConvBN(self.widths[0], 3, 2, dtype=self.dtype)(x, train)

        feats = []
        for i, (w, n) in enumerate(zip(self.widths[1:], self.blocks_per_stage[1:]), start=1):
            x = _ResBlock(w, stride=2, dtype=self.dtype)(x, train)
            for _ in range(n - 1):
                x = _ResBlock(w, stride=1, dtype=self.dtype)(x, train)
            feats.append(x)  # strides 8, 16, 32
        c3, c4, c5 = feats

        # FPN: top-down lateral fusion.
        p5 = nn.Conv(self.fpn_width, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="lat5")(c5)
        p4 = nn.Conv(self.fpn_width, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="lat4")(c4) + _upsample2(p5)
        p3 = nn.Conv(self.fpn_width, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="lat3")(c3) + _upsample2(p4)
        levels = [
            _ConvBN(self.fpn_width, 3, 1, dtype=self.dtype, name=f"smooth{i}")(p, train)
            for i, p in enumerate((p3, p4, p5))
        ]

        head = _ScrfdHead(self.head_width, self.head_depth, dtype=self.dtype, name="head")
        outputs = {}
        for stride, feat in zip(STRIDES, levels):
            outputs[stride] = head(feat, train)
        return outputs


class _ScrfdHead(nn.Module):
    width: int
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        B = x.shape[0]
        for i in range(self.depth):
            x = _ConvBN(self.width, 3, 1, dtype=self.dtype, name=f"tower{i}")(x, train)
        conv_kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)
        scores = nn.Conv(NUM_ANCHORS, (3, 3), padding="SAME", name="cls", **conv_kw)(x)
        bbox = nn.Conv(4 * NUM_ANCHORS, (3, 3), padding="SAME", name="box", **conv_kw)(x)
        kps = nn.Conv(10 * NUM_ANCHORS, (3, 3), padding="SAME", name="kps", **conv_kw)(x)
        return {
            "scores": scores.reshape(B, -1).astype(jnp.float32),
            "bbox": bbox.reshape(B, -1, 4).astype(jnp.float32),
            "kps": kps.reshape(B, -1, 10).astype(jnp.float32),
        }


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2× nearest upsample as broadcast+reshape.

    Equivalent to jax.image.resize(..., 'nearest') but with a trivial
    transpose (sum-reduce) — resize's gather lowers to a scatter in the
    backward pass, which is both slow and pathologically expensive for the
    TPU compiler in the detector's training graph.
    """
    B, H, W, C = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return y.reshape(B, H * 2, W * 2, C)


def fold_stem_pool_params(det_vars, pool: int):
    """Expand the first stem conv's kernel so the detector with
    ``stem_pool=pool`` reproduces pool-then-detect EXACTLY.

    avg-pool(p) then conv(w) == conv(w') at stride p·s with
    w'[p·i+a, p·j+b] = w[i, j] / p² for a, b < p — the composite window of
    each pooled tap is its p×p original block. Pure function of the
    checkpoint tree (usable inside jit; the expansion constant-folds).
    """
    if pool == 1:
        return det_vars
    params = dict(det_vars["params"])
    stem = dict(params["_ConvBN_0"])
    conv = dict(stem["Conv_0"])
    k = conv["kernel"]  # (3, 3, Cin, Cout)
    k = jnp.repeat(jnp.repeat(k, pool, axis=0), pool, axis=1) / (pool * pool)
    conv["kernel"] = k
    stem["Conv_0"] = conv
    params["_ConvBN_0"] = stem
    out = dict(det_vars)
    out["params"] = params
    return out
