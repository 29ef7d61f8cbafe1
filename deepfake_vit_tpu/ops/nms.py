"""Fixed-size NMS inside jit.

The reference delegates NMS to InsightFace/ONNX (``face_detector.py:220-227``);
variable-count detections are dynamic-shape hostile on TPU, so this is the
static-shape redesign called out in SURVEY.md §7 hard part 1: scores are
masked, selection runs a fixed ``max_outputs``-step ``fori_loop`` (O(K·N)
on the VPU — K is small), and outputs are padded with score 0 / index -1.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for xyxy boxes: (N, 4) × (M, 4) → (N, M)."""
    area_a = jnp.maximum(boxes_a[:, 2] - boxes_a[:, 0], 0) * jnp.maximum(
        boxes_a[:, 3] - boxes_a[:, 1], 0
    )
    area_b = jnp.maximum(boxes_b[:, 2] - boxes_b[:, 0], 0) * jnp.maximum(
        boxes_b[:, 3] - boxes_b[:, 1], 0
    )
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.4,
    score_threshold: float = 0.0,
    max_outputs: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static output size.

    Returns (indices (K,), valid (K,)): selected candidate indices padded
    with -1 where fewer than ``max_outputs`` survive.
    """
    n = boxes.shape[0]
    live = scores > score_threshold

    def body(state, _):
        live_mask, = state
        masked = jnp.where(live_mask, scores, -jnp.inf)
        idx = jnp.argmax(masked)
        ok = masked[idx] > -jnp.inf
        # Suppress everything with IoU above threshold w.r.t. the pick.
        ious = iou_matrix(boxes[idx][None, :], boxes)[0]
        new_live = live_mask & (ious <= iou_threshold)
        new_live = new_live.at[idx].set(False)
        live_mask = jnp.where(ok, new_live, live_mask)
        return (live_mask,), (jnp.where(ok, idx, -1), ok)

    (_,), (indices, valid) = jax.lax.scan(body, (live,), None, length=max_outputs)
    return indices, valid


def nms_batched(boxes, scores, iou_threshold=0.4, score_threshold=0.0, max_outputs=64):
    """vmapped NMS over a batch: (B, N, 4), (B, N) → (B, K), (B, K)."""
    fn = lambda b, s: nms(b, s, iou_threshold, score_threshold, max_outputs)
    return jax.vmap(fn)(boxes, scores)
