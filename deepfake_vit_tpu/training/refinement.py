"""RefineNet (cascade stage-2) training: crop sampling + losses + step.

facenet-pytorch's R/O-Nets ship pretrained and untrainable in the
reference (``src/preprocessing/face_detector.py:33-39``); this module
makes the cascade stage trainable in-framework the same way
``training/detection.py`` makes the proposal nets trainable. MTCNN's
classic online sampling scheme, adapted to static shapes:

- every image contributes a FIXED K crop slots per step (no dynamic
  positive/negative lists): each slot draws a jittered ground-truth box
  (positive candidate) or a random/shifted square (negative candidate);
- labels by proposal↔GT IoU — ≥ ``POS_IOU`` ⇒ face (cls 1, box + kps
  regression), < ``NEG_IOU`` ⇒ non-face (cls 0), in between ⇒ "part
  face": cls-masked, box regression only (the MTCNN part-sample rule);
- regression targets are normalized by the margin-expanded crop square
  (models/refine_net.py conventions), so training crops see exactly the
  inference-time distribution of ``square_boxes(proposal, margin)``.

The crops themselves are cut INSIDE the jitted train step with the same
batched ``crop_and_resize`` the serving cascade uses — the sampler ships
only (B, K, 4) boxes + targets, never pixel crops, keeping the host↔device
payload small and the crop op itself under test by training.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.refine_net import REFINE_CROP
from ..ops.warp import crop_and_resize

POS_IOU = 0.55
NEG_IOU = 0.30


def _square_np(box: np.ndarray, margin: float) -> np.ndarray:
    """Numpy twin of models.refine_net.square_boxes for the host sampler
    (kept bit-identical: center square, side = max(w,h)·(1+2·margin))."""
    cx, cy = (box[0] + box[2]) * 0.5, (box[1] + box[3]) * 0.5
    side = max(max(box[2] - box[0], box[3] - box[1]) * (1.0 + 2.0 * margin), 1.0)
    h = side * 0.5
    return np.array([cx - h, cy - h, cx + h, cy + h], np.float32)


def _iou_one(box: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """box (4,) vs gts (G,4) → (G,) IoU (numpy, host-side sampler)."""
    lt = np.maximum(box[:2], gts[:, :2])
    rb = np.minimum(box[2:], gts[:, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    a = max((box[2] - box[0]) * (box[3] - box[1]), 0.0)
    ag = np.maximum(gts[:, 2] - gts[:, 0], 0.0) * np.maximum(gts[:, 3] - gts[:, 1], 0.0)
    return inter / np.maximum(a + ag - inter, 1e-9)


def sample_refine_targets(
    det_batch: Dict[str, np.ndarray],
    rng: np.random.Generator,
    crops_per_image: int = 8,
    margin: float = 0.15,
) -> Dict[str, np.ndarray]:
    """Detection batch {'image','boxes','kps','valid'} → refiner batch.

    Returns {'image' (B,H,W,3) [shared], 'crop_boxes' (B,K,4) margin-
    expanded squares, 'cls' (B,K), 'cls_mask' (B,K), 'box_t' (B,K,4),
    'box_mask' (B,K), 'kps_t' (B,K,10), 'kps_mask' (B,K)}.
    """
    images = det_batch["image"]
    B = images.shape[0]
    H, W = images.shape[1], images.shape[2]
    K = crops_per_image

    crop_boxes = np.zeros((B, K, 4), np.float32)
    cls = np.zeros((B, K), np.float32)
    cls_mask = np.ones((B, K), np.float32)
    box_t = np.zeros((B, K, 4), np.float32)
    box_mask = np.zeros((B, K), np.float32)
    kps_t = np.zeros((B, K, 10), np.float32)
    kps_mask = np.zeros((B, K), np.float32)

    for b in range(B):
        valid = det_batch["valid"][b].astype(bool)
        gts = det_batch["boxes"][b][valid]  # (G, 4)
        gkps = det_batch["kps"][b][valid]  # (G, 5, 2)
        G = len(gts)
        for k in range(K):
            proposal = None
            if G and rng.uniform() < 0.7:
                # positive candidate: jittered GT
                g = rng.integers(G)
                x1, y1, x2, y2 = gts[g]
                w, h = max(x2 - x1, 2.0), max(y2 - y1, 2.0)
                s = rng.uniform(0.8, 1.25)
                dx = rng.uniform(-0.2, 0.2) * w
                dy = rng.uniform(-0.2, 0.2) * h
                cx, cy = (x1 + x2) / 2 + dx, (y1 + y2) / 2 + dy
                nw, nh = w * s, h * s
                proposal = np.array(
                    [cx - nw / 2, cy - nh / 2, cx + nw / 2, cy + nh / 2], np.float32
                )
            else:
                # negative candidate: random square, or far-shifted GT
                if G and rng.uniform() < 0.5:
                    g = rng.integers(G)
                    x1, y1, x2, y2 = gts[g]
                    side = max(x2 - x1, y2 - y1, 8.0)
                    shift = rng.uniform(0.6, 1.4) * side
                    ang = rng.uniform(0, 2 * np.pi)
                    cx = (x1 + x2) / 2 + shift * np.cos(ang)
                    cy = (y1 + y2) / 2 + shift * np.sin(ang)
                else:
                    side = rng.uniform(0.1, 0.5) * min(H, W)
                    cx = rng.uniform(side / 2, W - side / 2)
                    cy = rng.uniform(side / 2, H - side / 2)
                proposal = np.array(
                    [cx - side / 2, cy - side / 2, cx + side / 2, cy + side / 2],
                    np.float32,
                )

            iou = _iou_one(proposal, gts) if G else np.zeros((1,), np.float32)
            best = int(np.argmax(iou)) if G else 0
            best_iou = float(iou[best]) if G else 0.0

            sq = _square_np(proposal, margin)
            side = sq[2] - sq[0]
            crop_boxes[b, k] = sq

            if best_iou >= POS_IOU:
                cls[b, k] = 1.0
                gx = gts[best]
                # Corner-relative MTCNN encoding: x1' = sq_x1 + d·side etc.,
                # the exact inverse of refine_net.apply_box_deltas.
                box_t[b, k] = (gx - sq) / side
                box_mask[b, k] = 1.0
                kps_t[b, k] = (
                    (gkps[best] - sq[:2][None]) / side
                ).reshape(10)
                kps_mask[b, k] = 1.0
            elif best_iou < NEG_IOU:
                cls[b, k] = 0.0
            else:
                # part face: no cls signal, box regression only
                cls_mask[b, k] = 0.0
                gx = gts[best]
                box_t[b, k] = (gx - sq) / side
                box_mask[b, k] = 1.0

    return {
        "image": images,
        "crop_boxes": crop_boxes,
        "cls": cls,
        "cls_mask": cls_mask,
        "box_t": box_t,
        "box_mask": box_mask,
        "kps_t": kps_t,
        "kps_mask": kps_mask,
    }


def refinement_loss(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    box_weight: float = 1.0,
    kps_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Masked BCE + huber losses over flattened (B·K,) refiner outputs."""
    cls_t = batch["cls"].reshape(-1)
    cls_m = batch["cls_mask"].reshape(-1)
    n_cls = jnp.maximum(jnp.sum(cls_m), 1.0)
    cls_loss = (
        jnp.sum(optax.sigmoid_binary_cross_entropy(out["score"], cls_t) * cls_m)
        / n_cls
    )

    box_m = batch["box_mask"].reshape(-1)
    n_box = jnp.maximum(jnp.sum(box_m), 1.0)
    box_err = optax.huber_loss(out["box"], batch["box_t"].reshape(-1, 4), delta=1.0)
    box_loss = jnp.sum(jnp.sum(box_err, -1) * box_m) / n_box

    kps_m = batch["kps_mask"].reshape(-1)
    n_kps = jnp.maximum(jnp.sum(kps_m), 1.0)
    kps_err = optax.huber_loss(out["kps"], batch["kps_t"].reshape(-1, 10), delta=1.0)
    kps_loss = jnp.sum(jnp.sum(kps_err, -1) * kps_m) / n_kps

    total = cls_loss + box_weight * box_loss + kps_weight * kps_loss
    return {"total": total, "cls": cls_loss, "box": box_loss, "kps": kps_loss}


def make_refiner_train_step(
    model, optimizer, crop_size: int = REFINE_CROP, mesh=None,
    kps_weight: float = 2.0,
):
    """Jitted refiner step; batch from ``sample_refine_targets``.

    Same (params, batch_stats, opt_state, batch) → (…, metrics) contract
    as ``make_detector_train_step`` so scripts/train_detector.py drives
    both with one loop. ``kps_weight`` defaults to 2.0: the landmark head
    is the binding acceptance bar (<0.10 IED) while cls/box clear theirs
    with margin, so the shared trunk's capacity is tilted toward it.
    """

    def loss_fn(params, batch_stats, batch):
        x = (batch["image"].astype(jnp.float32) - 127.5) / 128.0
        B, K = batch["crop_boxes"].shape[:2]

        def crops_for_image(img, boxes_k):
            tiled = jnp.broadcast_to(img[None], (K, *img.shape))
            return crop_and_resize(tiled, boxes_k, (crop_size, crop_size))

        crops = jax.vmap(crops_for_image)(x, batch["crop_boxes"])
        crops = crops.reshape(B * K, crop_size, crop_size, x.shape[-1])
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            crops,
            train=True,
            mutable=["batch_stats"],
        )
        losses = refinement_loss(out, batch, kps_weight=kps_weight)
        # train_detector logs a 'kps'-keyed metric dict; add num_pos parity
        losses["num_pos"] = jnp.sum(batch["cls"] * batch["cls_mask"])
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
