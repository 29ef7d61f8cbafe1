"""S2D-Lite: TPU-first ultra-light face detector (third trainable family).

ROADMAP item 1b asked for a "BlazeFace-class" ultra-light single-shot
detector as a straight SCRFD replacement at the 320² canvas. BlazeFace's
actual recipe (5×5 depthwise kernels, mobile-GPU scheduling) is a
mobile-CPU/GPU design; on TPU it inverts — depthwise convolutions at low
channel counts run the VPU at 3/128–48/128 lane utilization, which is
exactly the measured early-stage wall of both the SCRFD net and the B4
backbone (BASELINE.md round-1 stage profile). This module keeps the GOAL
(a drastically cheaper detector with the same contract and acceptance
bars) with the opposite, TPU-native means:

- **All spatial resolution moves into lanes up front**: a 4× space-to-depth
  rearrangement turns the 320²×3 canvas into 80²×48 before the first
  convolution. Every convolution in the network is a plain dense 3×3 MXU
  matmul at C ≥ 48 — no low-C spatial convs, no depthwise stages, no image
  pyramid, and the largest spatial extent any conv sees is 80².
- The net is ~5 dense convs + 3 stride-2 transitions + a 1×1-lateral FPN
  with 3×3 smooth convs and a shared depth-2 head — about 2.1M params vs
  the SCRFD net's ~3.5M, with its FLOPs concentrated where the MXU is
  efficient.

Why the s2d-early post-mortem (models/s2d_early.py, measured out at 92.8
vs 75.1 ms e2e) does NOT apply here: that route had to reproduce a
pretrained EfficientNet's per-channel convolutions bit-exactly on blocked
tensors, forcing grouped 4-phase k3 convs that lower slower than the plain
stages they replaced. This network is DESIGNED around the blocked layout —
its convolutions are ordinary dense convs over the s2d channels, the
layout cost is zero by construction, and training happens directly in this
parameterization.

Output contract = ``ScrfdDetector`` (models/scrfd.py): per-stride dicts
``{'scores' (B, N_l), 'bbox' (B, N_l, 4), 'kps' (B, N_l, 10)}`` at strides
{8, 16, 32} with 2 anchors per location, so the batched anchor decode
(ops/anchors.py), fixed-size NMS (ops/nms.py), the FCOS-style trainer
(training/detection.py), and the whole ``FaceDetector`` host API are
shared unchanged. Like the other families it replaces the reference's
third-party native detection capability (InsightFace buffalo_l via
onnxruntime — ``/root/reference/src/preprocessing/face_detector.py:195-276``)
with an in-framework trainable network.

Serving integration mirrors the SCRFD stem-pool fold: with
``stem_pool=p`` the module consumes p·canvas frames directly by raising
the space-to-depth factor to 4p, and ``fold_stem_pool_params_lite``
expands the canonical first-conv weights so pool-then-detect is
reproduced EXACTLY (an average pool is a linear map on s2d blocks).

Training status: the FIRST capacity point (widths (64, 96, 128, 160),
raw 1×1-lateral FPN, depth-1 head, ~0.9M params) ran 33 epochs on the
2,500-scene procedural corpus (AdamW 1e-3, 320²), converged in loss
(total 0.12) but plateaued at recall 0.75 / clutter pass-rate 0.75 vs
the 0.9 bars — under-fit, not under-trained (the judge measured the
identical 0.75s mid-train at ~e20). The capacity was therefore raised
to match the structural elements SCRFD has and the lite net lacked:
widths → (64, 128, 192, 256), post-FPN 3×3 smooth convs (the depth-1
head previously read raw lateral sums), and head depth 1 → 2 (~2.1M
params, every conv still a dense ≥48-channel MXU matmul). Weights ship
only via scripts/promote_weights.py after the SCRFD-level acceptance
tests pass (docs/DESIGN.md § weight gate).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import STRIDES
from .scrfd import _ConvBN, _ScrfdHead, _upsample2


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/f, W/f, f·f·C), channel c = (a·f + b)·C + rgb
    where (a, b) is the position inside the f×f block."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // f, f, W // f, f, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // f, W // f, f * f * C)


class LiteDetector(nn.Module):
    """Space-to-depth ultra-light multi-level face detector.

    ``__call__(images, train)`` with images (B, H, W, 3) normalized
    ((x-127.5)/128, the shared detector convention) returns the
    ScrfdDetector per-level output dict. H, W must be multiples of
    32·stem_pool (anchor-grid alignment).
    """

    widths: Sequence[int] = (64, 128, 192, 256)  # at strides 4, 8, 16, 32
    fpn_width: int = 64
    head_depth: int = 2
    dtype: Any = jnp.float32
    # stem_pool=p > 1: consume p·canvas frames directly — the s2d factor
    # becomes 4p and the first conv's kernel is expanded by
    # fold_stem_pool_params_lite so outputs equal pool-then-detect exactly.
    stem_pool: int = 1
    s2d: int = 4

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        x = images.astype(self.dtype)
        x = space_to_depth(x, self.s2d * self.stem_pool)

        # Stride-4 trunk (80² at the 320² canvas), all dense k3 MXU convs.
        x = _ConvBN(self.widths[0], 3, 1, dtype=self.dtype, name="conv1")(x, train)
        x = _ConvBN(self.widths[0], 3, 1, dtype=self.dtype, name="conv2")(x, train)

        feats = []
        for i, w in enumerate(self.widths[1:], start=1):
            x = _ConvBN(w, 3, 2, dtype=self.dtype, name=f"down{i}")(x, train)
            x = _ConvBN(w, 3, 1, dtype=self.dtype, name=f"conv{i + 2}")(x, train)
            feats.append(x)  # strides 8, 16, 32
        c3, c4, c5 = feats

        conv_kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)
        p5 = nn.Conv(self.fpn_width, (1, 1), name="lat5", **conv_kw)(c5)
        p4 = nn.Conv(self.fpn_width, (1, 1), name="lat4", **conv_kw)(c4) + _upsample2(p5)
        p3 = nn.Conv(self.fpn_width, (1, 1), name="lat3", **conv_kw)(c3) + _upsample2(p4)
        levels = [
            _ConvBN(self.fpn_width, 3, 1, dtype=self.dtype, name=f"smooth{i}")(p, train)
            for i, p in enumerate((p3, p4, p5))
        ]

        head = _ScrfdHead(self.fpn_width, self.head_depth, dtype=self.dtype,
                          name="head")
        return {
            stride: head(feat, train)
            for stride, feat in zip(STRIDES, levels)
        }


def fold_stem_pool_params_lite(det_vars, pool: int, s2d: int = 4):
    """Expand conv1's kernel so ``LiteDetector(stem_pool=pool)`` on
    pool·canvas frames reproduces pool-then-detect EXACTLY.

    avg-pool(p) followed by s2d(f) equals s2d(p·f) followed by averaging
    each coarse channel's p² fine sub-block channels: coarse channel
    (a, b, rgb) is the mean of fine channels (p·a + da, p·b + db, rgb)
    for da, db < p. So the expanded kernel gathers each fine channel's
    coarse parent and divides by p². Pure function of the checkpoint tree
    (constant-folds under jit).
    """
    if pool == 1:
        return det_vars
    import numpy as np

    f0, f1 = s2d, s2d * pool
    # src[c1] = canonical channel index feeding fine channel c1.
    a1, b1 = np.meshgrid(np.arange(f1), np.arange(f1), indexing="ij")
    coarse = (a1 // pool) * f0 + (b1 // pool)  # (f1, f1)
    src = (coarse[..., None] * 3 + np.arange(3)).reshape(-1)  # (f1·f1·3,)

    params = dict(det_vars["params"])
    stem = dict(params["conv1"])
    conv = dict(stem["Conv_0"])
    k = conv["kernel"]  # (3, 3, f0·f0·3, Cout)
    conv["kernel"] = k[:, :, src, :] / (pool * pool)
    stem["Conv_0"] = conv
    params["conv1"] = stem
    out = dict(det_vars)
    out["params"] = params
    return out
