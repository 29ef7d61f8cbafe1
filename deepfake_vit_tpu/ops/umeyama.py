"""Batched Umeyama similarity estimation + affine utilities.

Replaces skimage ``SimilarityTransform.estimate`` (used at reference
``face_aligner.py:115-116``) with the closed-form Umeyama (1991) solution
in pure jax.numpy — trivially batchable over faces, and exact for the
5-point landmark problem. Also provides the 3-point affine solve
(reference's ``cv2.getAffineTransform`` path, ``face_aligner.py:130-159``)
and 2×3-matrix helpers (inversion, point transform).
"""

from __future__ import annotations

import jax.numpy as jnp


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Similarity transform (rotation+scale+translation) mapping src → dst.

    src, dst: (..., N, 2) point sets.
    Returns (..., 2, 3) affine matrices A with dst ≈ A @ [src, 1]ᵀ.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[-2]

    mu_src = jnp.mean(src, axis=-2, keepdims=True)  # (..., 1, 2)
    mu_dst = jnp.mean(dst, axis=-2, keepdims=True)
    src_d = src - mu_src
    dst_d = dst - mu_dst

    # Covariance (..., 2, 2) = dstᵀ src / n
    cov = jnp.einsum("...ni,...nj->...ij", dst_d, src_d) / n
    var_src = jnp.mean(jnp.sum(src_d * src_d, axis=-1), axis=-1)  # (...,)

    U, S, Vt = jnp.linalg.svd(cov)
    # Reflection guard: d = sign(det(U) det(V))
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d = jnp.stack([jnp.ones_like(det), jnp.sign(det)], axis=-1)  # (..., 2)

    R = jnp.einsum("...ij,...j,...jk->...ik", U, d, Vt)
    scale = jnp.sum(S * d, axis=-1) / jnp.maximum(var_src, 1e-12)

    sR = scale[..., None, None] * R
    t = mu_dst[..., 0, :] - jnp.einsum("...ij,...j->...i", sR, mu_src[..., 0, :])
    return jnp.concatenate([sR, t[..., :, None]], axis=-1)  # (..., 2, 3)


def affine_from_3pts(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Exact affine from 3 point pairs (cv2.getAffineTransform semantics).

    src, dst: (..., 3, 2). Returns (..., 2, 3).
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    ones = jnp.ones(src.shape[:-1] + (1,), src.dtype)
    M = jnp.concatenate([src, ones], axis=-1)  # (..., 3, 3)
    # Solve M @ Aᵀ = dst for each of the two output coords.
    A_t = jnp.linalg.solve(M, dst)  # (..., 3, 2)
    return jnp.swapaxes(A_t, -1, -2)  # (..., 2, 3)


def invert_affine(A: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 2, 3) affine matrices."""
    R = A[..., :2]
    t = A[..., 2]
    det = R[..., 0, 0] * R[..., 1, 1] - R[..., 0, 1] * R[..., 1, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    Rinv = (
        jnp.stack(
            [R[..., 1, 1], -R[..., 0, 1], -R[..., 1, 0], R[..., 0, 0]], axis=-1
        ).reshape(A.shape[:-2] + (2, 2))
        * inv_det[..., None, None]
    )
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
    return jnp.concatenate([Rinv, tinv[..., :, None]], axis=-1)


def transform_points(A: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 2, 3) affines to (..., N, 2) points."""
    return jnp.einsum("...ij,...nj->...ni", A[..., :2], pts) + A[..., None, :, 2]
