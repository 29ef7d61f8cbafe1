"""RefineNet: TPU-first cascade refinement stage (MTCNN R/O-Net analog).

The reference's fallback detector is facenet-pytorch MTCNN — a THREE-stage
cascade (P-Net proposals → R-Net 24² crop refinement → O-Net 48² landmark
stage) with per-stage thresholds ``[0.6, 0.7, 0.8]``
(``src/preprocessing/face_detector.py:33-39``). Round 1-3 honored the
capability with the single-shot MtcnnLiteDetector (models/mtcnn_lite.py);
this module restores the cascade SEMANTICS — per-proposal crop
re-scoring, bounding-box regression, and landmark refinement — as one
fused, static-shape stage:

- the torch cascade re-enters the host between stages, crops a *dynamic*
  number of proposals with PIL/numpy, and rebuilds tensors per stage.
  Here the proposal stage already emits a FIXED ``max_detections`` slate
  with a validity mask (ops/nms.py), so refinement is a pure function
  appended to the same jit graph: top-K slots are square-expanded,
  cropped with the batched affine-warp crop (``ops/warp.crop_and_resize``
  — a matmul formulation that rides the MXU; CLAUDE.md: computed gathers
  are ~1000× slow on TPU), and re-scored by one (B·K, S, S, 3) forward.
  One dispatch end-to-end; K is static; invalid slots ride along masked.
- R-Net (24², no landmarks) and O-Net (48², landmarks) collapse into ONE
  head, at 64² rather than O-Net's 48²: the landmark head is
  resolution-bound, and the measured ladder on this corpus is 32² →
  ~0.14 IED, 48² → 0.105 IED (plateaued after a kps-weight-6 fine-tune;
  just misses the <0.10 bar), i.e. error ≈ 1/side — which is precisely
  why MTCNN runs landmarks at 48², not 24², and why this stage takes one
  more doubling-step than MTCNN (64² ≈ 0.08 IED predicted; iterating the
  48² refiner a second pass on its own refined box only moved 0.105 →
  0.100, within scene-set noise). Stage thresholds
  [0.6, 0.7, 0.8] map to: proposal ``confidence_threshold`` (first),
  ``refine_threshold`` (the cascade's final gate, default 0.7 on the
  refined score).

Box/landmark regression follows the MTCNN target convention: offsets are
normalized by the (square) crop side, landmarks live in [0, 1] crop
coordinates.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.warp import crop_and_resize

REFINE_CROP = 64  # static crop side (one doubling-step past O-Net's 48²;
#                   R-Net's 24² role fused in — see resolution ladder above)


class RefineNet(nn.Module):
    """(N, S, S, 3) normalized crops → {'score' (N,), 'box' (N,4),
    'kps' (N,10)}.

    Dense little tower: stride-2 convs instead of MTCNN's 3×3 maxpools
    (pools waste the MXU; stride-2 convs ARE the downsample and the
    contraction), channels wide enough that every conv is a real matmul.
    ~0.45M params at 64² crops — still noise next to the proposal net.
    """

    widths: Any = (32, 64, 96, 128)  # 64→32→16→8→4; flatten 4·4·128
    dense: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = crops.astype(self.dtype)
        bn_kw = dict(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=self.dtype, param_dtype=jnp.float32)
        conv_kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}", **conv_kw)(x)
            x = nn.BatchNorm(name=f"bn{i}", **bn_kw)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.dense, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc")(x)
        x = nn.relu(x)
        head_kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        return {
            "score": nn.Dense(1, name="cls", **head_kw)(x)[:, 0].astype(jnp.float32),
            "box": nn.Dense(4, name="box", **head_kw)(x).astype(jnp.float32),
            "kps": nn.Dense(10, name="kps", **head_kw)(x).astype(jnp.float32),
        }


def square_boxes(boxes: jnp.ndarray, margin: float = 0.15) -> jnp.ndarray:
    """Expand xyxy boxes to margin-padded squares (MTCNN ``square`` op).

    boxes (..., 4) → (..., 4). The square is centered on the box center
    with side = max(w, h) · (1 + 2·margin); refinement targets/decodes are
    all expressed relative to this square.
    """
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    cx, cy = (x1 + x2) * 0.5, (y1 + y2) * 0.5
    side = jnp.maximum(x2 - x1, y2 - y1) * (1.0 + 2.0 * margin)
    side = jnp.maximum(side, 1.0)
    h = side * 0.5
    return jnp.stack([cx - h, cy - h, cx + h, cy + h], axis=-1)


def apply_box_deltas(sq_boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """MTCNN bbox regression decode: corners shift by delta · crop side.

    sq_boxes (..., 4) squares, deltas (..., 4) → refined xyxy (..., 4).
    """
    side = sq_boxes[..., 2] - sq_boxes[..., 0]
    return sq_boxes + deltas * side[..., None]


def decode_refined_kps(sq_boxes: jnp.ndarray, kps: jnp.ndarray) -> jnp.ndarray:
    """kps (..., 10) in [0,1] crop coords → (..., 5, 2) image coords."""
    side = sq_boxes[..., 2] - sq_boxes[..., 0]
    origin = sq_boxes[..., :2]  # (x1, y1)
    pts = kps.reshape(*kps.shape[:-1], 5, 2)
    return origin[..., None, :] + pts * side[..., None, None]


def refine_detections(
    refiner_apply,
    refiner_variables,
    images_norm: jnp.ndarray,
    dets: Dict[str, jnp.ndarray],
    top_k: int,
    refine_threshold: float = 0.7,
    crop_size: int = REFINE_CROP,
    margin: float = 0.15,
) -> Dict[str, jnp.ndarray]:
    """Jittable cascade tail: refine the top-K proposal slots in place.

    images_norm: (B, H, W, 3) the SAME normalized tensor the proposal net
    consumed (no second H2D, no re-normalize). dets: the padded NMS output
    {'boxes' (B,D,4), 'scores' (B,D), 'landmarks' (B,D,5,2), 'valid'
    (B,D)} — slots are already score-sorted by nms_batched, so the top-K
    slate is dets[:, :K]. Slots ≥ K pass through untouched; refined slots
    get the refiner's score (sigmoid), regressed box, and refined
    landmarks; final validity additionally requires
    refined score ≥ refine_threshold (the cascade's last-stage gate,
    reference thresholds[2] = 0.8 semantics, default 0.7 to match our
    looser single-proposal stage).
    """
    B, D = dets["scores"].shape
    K = min(top_k, D)

    sq = square_boxes(dets["boxes"][:, :K], margin)  # (B, K, 4)

    # K crops per image WITHOUT materializing B·K frame copies: broadcast
    # the image across the K axis (free in XLA — the bilinear taps read the
    # same buffer) and vmap the batched crop per image.
    def crops_for_image(img, boxes_k):
        tiled = jnp.broadcast_to(img[None], (K, *img.shape))
        return crop_and_resize(tiled, boxes_k, (crop_size, crop_size))

    crops = jax.vmap(crops_for_image)(images_norm, sq)  # (B, K, S, S, 3)
    crops = crops.reshape(B * K, crop_size, crop_size, crops.shape[-1])
    out = refiner_apply(refiner_variables, crops)  # dict of (B·K, ·)

    r_score = jax.nn.sigmoid(out["score"]).reshape(B, K)
    r_box = apply_box_deltas(sq, out["box"].reshape(B, K, 4))
    r_kps = decode_refined_kps(sq, out["kps"].reshape(B, K, 10))

    keep = dets["valid"][:, :K] & (r_score >= refine_threshold)
    pad_b = dets["boxes"][:, K:]
    pad_s = dets["scores"][:, K:]
    pad_l = dets["landmarks"][:, K:]
    pad_v = dets["valid"][:, K:]
    return {
        "boxes": jnp.concatenate([jnp.where(keep[..., None], r_box,
                                            dets["boxes"][:, :K]), pad_b], axis=1),
        "scores": jnp.concatenate([jnp.where(keep, r_score, 0.0), pad_s], axis=1),
        "landmarks": jnp.concatenate(
            [jnp.where(keep[..., None, None], r_kps, dets["landmarks"][:, :K]),
             pad_l], axis=1),
        "valid": jnp.concatenate([keep, pad_v], axis=1),
    }
