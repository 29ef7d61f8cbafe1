"""Detector training: anchor assignment + losses + train step.

The reference consumes a pretrained ONNX RetinaFace and cannot train a
detector at all (SURVEY §2.11); converted weights may also be unavailable
offline. This module closes that gap: the SCRFD-class net
(models/scrfd.py) is trainable in-framework on (image, boxes, landmarks)
data with static shapes throughout:

- assignment: FCOS-style — an anchor is positive iff its center lies inside
  a GT box whose size falls in the anchor's stride range (8:[0,64],
  16:[64,128], 32:[128,inf)); ties broken by smallest GT area. GTs are
  padded to ``max_faces`` with a validity mask (no dynamic shapes).
- losses: sigmoid focal (cls, normalized by #positives), IoU loss on
  decoded boxes, smooth-L1 on stride-normalized landmark offsets.

This is a capability the reference lacks; it makes the detection path
self-sufficient rather than dependent on external weight conversion.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.anchors import STRIDES, all_anchor_centers, decode_boxes, decode_landmarks

# Per-stride face-size ranges (min side, max side) for level assignment.
SCALE_RANGES = {8: (0.0, 64.0), 16: (64.0, 128.0), 32: (128.0, 1e9)}


def assign_targets(
    centers: jnp.ndarray,
    strides: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_kps: jnp.ndarray,
    gt_valid: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Per-anchor targets for one image.

    centers (N,2), strides (N,), gt_boxes (G,4) xyxy, gt_kps (G,5,2),
    gt_valid (G,). Returns cls (N,), box (N,4), kps (N,5,2), pos (N,).
    """
    N = centers.shape[0]
    cx, cy = centers[:, 0], centers[:, 1]

    x1, y1, x2, y2 = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2], gt_boxes[:, 3]
    inside = (
        (cx[:, None] >= x1[None]) & (cx[:, None] <= x2[None])
        & (cy[:, None] >= y1[None]) & (cy[:, None] <= y2[None])
    )  # (N, G)

    size = jnp.minimum(x2 - x1, y2 - y1)  # (G,)
    lo = jnp.asarray([SCALE_RANGES[8][0], SCALE_RANGES[16][0], SCALE_RANGES[32][0]])
    hi = jnp.asarray([SCALE_RANGES[8][1], SCALE_RANGES[16][1], SCALE_RANGES[32][1]])
    level = jnp.select(
        [strides == 8, strides == 16, strides == 32],
        [jnp.int32(0), jnp.int32(1), jnp.int32(2)],
        jnp.int32(0),
    )
    in_range = (size[None, :] >= lo[level][:, None]) & (size[None, :] < hi[level][:, None])

    candidate = inside & in_range & gt_valid[None, :].astype(bool)  # (N, G)
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1.0)
    # pick the smallest-area matching GT per anchor
    score = jnp.where(candidate, -area[None, :], -jnp.inf)
    best_gt = jnp.argmax(score, axis=1)  # (N,)
    pos = jnp.any(candidate, axis=1)

    box_t = gt_boxes[best_gt]
    kps_t = gt_kps[best_gt]
    return {
        "cls": pos.astype(jnp.float32),
        "box": box_t,
        "kps": kps_t,
        "pos": pos,
    }


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * (1 - p_t) ** gamma * ce


def iou_loss(pred_boxes, gt_boxes):
    """1 - IoU, elementwise over matched pairs (xyxy)."""
    lt = jnp.maximum(pred_boxes[..., :2], gt_boxes[..., :2])
    rb = jnp.minimum(pred_boxes[..., 2:], gt_boxes[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.maximum(
        (pred_boxes[..., 2] - pred_boxes[..., 0]) * (pred_boxes[..., 3] - pred_boxes[..., 1]), 0.0
    )
    area_g = jnp.maximum(
        (gt_boxes[..., 2] - gt_boxes[..., 0]) * (gt_boxes[..., 3] - gt_boxes[..., 1]), 0.0
    )
    union = area_p + area_g - inter
    return 1.0 - inter / jnp.maximum(union, 1e-9)


def detection_loss(
    outputs: Dict[int, Dict[str, jnp.ndarray]],
    centers: jnp.ndarray,
    strides: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_kps: jnp.ndarray,
    gt_valid: jnp.ndarray,
    box_weight: float = 2.0,
    kps_weight: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Batched detection loss over the multi-level outputs.

    gt_boxes (B,G,4), gt_kps (B,G,5,2), gt_valid (B,G).
    """
    scores = jnp.concatenate([outputs[s]["scores"] for s in STRIDES], axis=1)  # (B,N)
    dist = jnp.concatenate([outputs[s]["bbox"] for s in STRIDES], axis=1)
    kps = jnp.concatenate([outputs[s]["kps"] for s in STRIDES], axis=1)

    targets = jax.vmap(lambda b, k, v: assign_targets(centers, strides, b, k, v))(
        gt_boxes, gt_kps, gt_valid
    )
    pos = targets["pos"]  # (B, N)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)

    cls_loss = jnp.sum(sigmoid_focal_loss(scores, targets["cls"])) / n_pos

    pred_boxes = decode_boxes(centers, strides, dist)
    box_l = iou_loss(pred_boxes, targets["box"])
    box_loss = jnp.sum(jnp.where(pos, box_l, 0.0)) / n_pos

    pred_kps = decode_landmarks(centers, strides, kps)  # (B,N,5,2)
    kps_err = (pred_kps - targets["kps"]) / strides[None, :, None, None]
    kps_l = jnp.sum(optax.huber_loss(kps_err, delta=1.0), axis=(-1, -2))
    kps_loss = jnp.sum(jnp.where(pos, kps_l, 0.0)) / n_pos

    total = cls_loss + box_weight * box_loss + kps_weight * kps_loss
    return {
        "total": total,
        "cls": cls_loss,
        "box": box_loss,
        "kps": kps_loss,
        "num_pos": n_pos,
    }


def make_detector_train_step(
    model,
    optimizer,
    input_size: Tuple[int, int],
    mesh=None,
):
    """Jitted detector train step: (variables, opt_state, batch, rng) → ...

    batch: {'image' (B,H,W,3) raw RGB [0,255], 'boxes' (B,G,4),
    'kps' (B,G,5,2), 'valid' (B,G)}.
    """
    centers_np, strides_np = all_anchor_centers(tuple(input_size))
    centers = jnp.asarray(centers_np)
    strides = jnp.asarray(strides_np)

    def loss_fn(params, batch_stats, batch):
        x = (batch["image"] - 127.5) / 128.0
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        losses = detection_loss(
            outputs, centers, strides, batch["boxes"], batch["kps"], batch["valid"]
        )
        return losses["total"], (mutated["batch_stats"], losses)

    def step(params, batch_stats, opt_state, batch):
        (_, (new_stats, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch
        )
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, losses

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, repl, repl, bsh),
            out_shardings=(repl, repl, repl, repl),
        )
    return jax.jit(step)
