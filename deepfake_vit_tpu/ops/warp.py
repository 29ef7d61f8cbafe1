"""Batched affine warp with bilinear sampling and constant border.

Replaces the reference's per-face ``cv2.warpAffine`` calls
(``face_aligner.py:119-126``) with one gather-based XLA kernel over the
whole batch: output pixel grids are mapped through the inverted affine,
sampled bilinearly with per-corner validity masks so out-of-bounds taps
contribute the border value — matching cv2's INTER_LINEAR +
BORDER_CONSTANT semantics (crop parity is what keeps AUC comparable,
SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .umeyama import invert_affine


def _bilinear_sample_one(
    img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray, border_value: float
) -> jnp.ndarray:
    """img: (H, W, C); xs, ys: (Ho, Wo) source coords. Returns (Ho, Wo, C)."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = xs - x0
    wx0 = 1.0 - wx1
    wy1 = ys - y0
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[yc, xc]  # (Ho, Wo, C) advanced-index gather
        vals = jnp.where(valid[..., None], vals, border_value)
        return w[..., None] * vals

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


def warp_affine(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_size: Tuple[int, int],
    border_value: float = 0.0,
    inverse: bool = False,
) -> jnp.ndarray:
    """Batched cv2.warpAffine equivalent.

    Args:
        images: (B, H, W, C) float.
        matrices: (B, 2, 3) affine src→dst (cv2 convention); the op inverts
            them internally unless ``inverse=True`` (matrices already dst→src).
        out_size: (Ho, Wo) output size.
    Returns:
        (B, Ho, Wo, C) warped images.
    """
    Ho, Wo = out_size
    images = images.astype(jnp.float32)
    A_inv = matrices if inverse else invert_affine(matrices)

    ys, xs = jnp.meshgrid(
        jnp.arange(Ho, dtype=jnp.float32), jnp.arange(Wo, dtype=jnp.float32), indexing="ij"
    )

    def one(img, A):
        sx = A[0, 0] * xs + A[0, 1] * ys + A[0, 2]
        sy = A[1, 0] * xs + A[1, 1] * ys + A[1, 2]
        return _bilinear_sample_one(img, sx, sy, border_value)

    return jax.vmap(one)(images, A_inv)


@partial(jax.jit, static_argnames=("out_size", "border_value"))
def warp_affine_jit(images, matrices, out_size, border_value=0.0):
    return warp_affine(images, matrices, out_size, border_value=border_value)


def crop_and_resize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: Tuple[int, int],
    border_value: float = 0.0,
) -> jnp.ndarray:
    """Batched box crop + bilinear resize expressed as an affine warp.

    boxes: (B, 4) [x1, y1, x2, y2] in source pixels.
    """
    Ho, Wo = out_size
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    sx = (x2 - x1) / Wo
    sy = (y2 - y1) / Ho
    zeros = jnp.zeros_like(sx)
    # dst→src mapping directly (inverse=True).
    A_inv = jnp.stack(
        [jnp.stack([sx, zeros, x1], -1), jnp.stack([zeros, sy, y1], -1)], axis=1
    )
    return warp_affine(images, A_inv, out_size, border_value, inverse=True)
