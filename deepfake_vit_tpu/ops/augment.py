"""On-device data augmentation (flip / rotation / color jitter).

The reference *declares* this block (`model_config.yaml:30-33`
``augmentation: random_flip / random_rotation / color_jitter`` marked
"future extension") but never implements it. Here it is implemented as
jittable batched transforms that run inside the train step — zero host
cost, using the framework's own warp for rotation:

- horizontal flip: image mirror + landmark x reflection + left/right
  landmark identity swap (eye↔eye, mouth↔mouth) so semantics hold;
- rotation: ±degrees about the image center via the batched affine warp
  (Pallas kernel on TPU), landmarks transformed with the same matrix;
- color jitter: per-sample brightness/contrast scales on normalized images.

Landmark convention: (x, y) pixels, order
[left_eye, right_eye, nose, left_mouth, right_mouth].
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .warp import warp_affine_auto

_FLIP_PERM = jnp.asarray([1, 0, 2, 4, 3])  # swap L/R eye and mouth


def random_flip(images, landmarks, rng):
    """Per-sample horizontal flip with probability 0.5."""
    B, H, W, _ = images.shape
    flip = jax.random.bernoulli(rng, 0.5, (B,))
    flipped = images[:, :, ::-1, :]
    images = jnp.where(flip[:, None, None, None], flipped, images)
    if landmarks is not None:
        lm_f = landmarks.at[:, :, 0].set(W - 1.0 - landmarks[:, :, 0])[:, _FLIP_PERM]
        landmarks = jnp.where(flip[:, None, None], lm_f, landmarks)
    return images, landmarks


def random_rotation(images, landmarks, rng, max_degrees: float = 5.0):
    """Per-sample rotation about the center, angle ~ U(−max, max)."""
    B, H, W, _ = images.shape
    theta = jax.random.uniform(
        rng, (B,), minval=-max_degrees, maxval=max_degrees
    ) * (jnp.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    # src→dst rotation about (cx, cy)
    tx = cx - cos * cx + sin * cy
    ty = cy - sin * cx - cos * cy
    A = jnp.stack(
        [
            jnp.stack([cos, -sin, tx], -1),
            jnp.stack([sin, cos, ty], -1),
        ],
        axis=1,
    )  # (B, 2, 3)
    images = warp_affine_auto(images, A, (H, W))
    if landmarks is not None:
        from .umeyama import transform_points

        landmarks = transform_points(A, landmarks)
    return images, landmarks


def color_jitter(images, rng, strength: float = 0.1):
    """Per-sample brightness (additive) + contrast (multiplicative) jitter.

    Operates correctly on ImageNet-normalized images: contrast scales
    around the per-image mean; brightness shifts in normalized units.
    """
    B = images.shape[0]
    k1, k2 = jax.random.split(rng)
    brightness = jax.random.uniform(k1, (B, 1, 1, 1), minval=-strength, maxval=strength)
    contrast = 1.0 + jax.random.uniform(k2, (B, 1, 1, 1), minval=-strength, maxval=strength)
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    return (images - mean) * contrast + mean + brightness


def make_augment_fn(aug_cfg: Optional[Dict[str, Any]]):
    """Build ``augment(batch, rng) -> batch`` from the config block.

    Config schema (model_config.yaml 'data.augmentation'): ``enabled``
    (default False — matching the reference where the block is dead),
    ``random_flip`` bool, ``random_rotation`` degrees, ``color_jitter``
    strength.
    """
    cfg = aug_cfg or {}
    if not cfg.get("enabled", False):
        return None
    use_flip = bool(cfg.get("random_flip", True))
    rot_deg = float(cfg.get("random_rotation", 0) or 0)
    jitter = float(cfg.get("color_jitter", 0) or 0)

    def augment(batch: Dict[str, jnp.ndarray], rng) -> Dict[str, jnp.ndarray]:
        images = batch["image"]
        landmarks = batch.get("landmarks")
        k1, k2, k3 = jax.random.split(rng, 3)
        if use_flip:
            images, landmarks = random_flip(images, landmarks, k1)
        if rot_deg > 0:
            images, landmarks = random_rotation(images, landmarks, k2, rot_deg)
        if jitter > 0:
            images = color_jitter(images, k3, jitter)
        out = dict(batch)
        out["image"] = images
        if landmarks is not None:
            out["landmarks"] = landmarks
        return out

    return augment
