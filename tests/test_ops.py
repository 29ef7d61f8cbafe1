"""Golden-parity tests for the batched preprocessing ops vs OpenCV/known math
(reference consumed these from cv2/skimage: ``face_aligner.py:102-159``,
``quality_checker.py:150-258``)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from deepfake_vit_tpu.ops.image import laplacian, rgb_to_gray
from deepfake_vit_tpu.ops.nms import iou_matrix, nms, nms_batched
from deepfake_vit_tpu.ops.quality import overall_quality, quality_scores
from deepfake_vit_tpu.ops.umeyama import (
    affine_from_3pts,
    invert_affine,
    transform_points,
    umeyama,
)
from deepfake_vit_tpu.ops.warp import crop_and_resize, warp_affine


# ---------------------------------------------------------------------------
# Umeyama / affine
# ---------------------------------------------------------------------------

def test_umeyama_recovers_similarity(rng):
    theta = 0.3
    s = 1.7
    R = s * np.asarray([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.asarray([5.0, -3.0])
    src = rng.uniform(0, 100, size=(5, 2)).astype(np.float32)
    dst = src @ R.T + t

    A = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(A[:, :2], R, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(A[:, 2], t, rtol=1e-3, atol=1e-2)


def test_umeyama_batched(rng):
    src = rng.uniform(0, 224, size=(8, 5, 2)).astype(np.float32)
    dst = src * 0.5 + 10.0
    A = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
    assert A.shape == (8, 2, 3)
    mapped = np.asarray(transform_points(jnp.asarray(A), jnp.asarray(src)))
    np.testing.assert_allclose(mapped, dst, rtol=1e-3, atol=1e-2)


def test_umeyama_least_squares_vs_cv2():
    # Local fixed-seed rng, NOT the shared session fixture: cv2's LMEDS is
    # a robust estimator that legitimately diverges from least-squares
    # Umeyama on unlucky noise draws, so this sample must not shift when
    # tests are added elsewhere in the suite.
    local = np.random.default_rng(4242)
    src = local.uniform(0, 224, size=(5, 2)).astype(np.float32)
    dst = src * 1.2 + local.normal(0, 2.0, size=(5, 2)).astype(np.float32) + 7.0
    A = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
    M, _ = cv2.estimateAffinePartial2D(
        src.reshape(-1, 1, 2), dst.reshape(-1, 1, 2), method=cv2.LMEDS
    )
    np.testing.assert_allclose(A, M, rtol=5e-2, atol=0.5)


def test_affine_from_3pts_vs_cv2(rng):
    src = rng.uniform(0, 100, size=(3, 2)).astype(np.float32)
    dst = rng.uniform(0, 100, size=(3, 2)).astype(np.float32)
    A = np.asarray(affine_from_3pts(jnp.asarray(src), jnp.asarray(dst)))
    M = cv2.getAffineTransform(src, dst)
    np.testing.assert_allclose(A, M, rtol=1e-3, atol=1e-3)


def test_invert_affine():
    A = jnp.asarray([[2.0, 0.0, 5.0], [0.0, 0.5, -1.0]])
    Ainv = invert_affine(A)
    pts = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    round_trip = transform_points(Ainv[None], transform_points(A[None], pts[None]))[0]
    np.testing.assert_allclose(np.asarray(round_trip), np.asarray(pts), atol=1e-5)


# ---------------------------------------------------------------------------
# Warp
# ---------------------------------------------------------------------------

def test_warp_affine_vs_cv2(rng):
    img = rng.uniform(0, 255, size=(64, 80, 3)).astype(np.float32)
    theta = 0.2
    M = np.asarray(
        [[1.2 * np.cos(theta), -1.2 * np.sin(theta), 4.0],
         [1.2 * np.sin(theta), 1.2 * np.cos(theta), -6.0]],
        dtype=np.float32,
    )
    ours = np.asarray(warp_affine(jnp.asarray(img)[None], jnp.asarray(M)[None], (48, 56)))[0]
    ref = cv2.warpAffine(img, M, (56, 48), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    np.testing.assert_allclose(ours, ref, atol=1.0)  # subpixel rounding differences
    assert np.mean(np.abs(ours - ref)) < 0.05


def test_crop_and_resize_vs_cv2(rng):
    img = rng.uniform(0, 255, size=(100, 120, 3)).astype(np.float32)
    box = np.asarray([[10.0, 20.0, 74.0, 84.0]], np.float32)
    ours = np.asarray(crop_and_resize(jnp.asarray(img)[None], jnp.asarray(box), (32, 32)))[0]
    # Same mapping implemented via cv2: dst pixel p ← src (x1 + p*sx).
    sx = (74.0 - 10.0) / 32
    M = np.asarray([[1 / sx, 0, -10.0 / sx], [0, 1 / sx, -20.0 / sx]], np.float32)
    ref = cv2.warpAffine(img, M, (32, 32), flags=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=1.0)
    assert np.mean(np.abs(ours - ref)) < 0.1


# ---------------------------------------------------------------------------
# Image / quality
# ---------------------------------------------------------------------------

def test_gray_and_laplacian_vs_cv2(rng):
    img = rng.uniform(0, 255, size=(2, 32, 40, 3)).astype(np.float32)
    ours_gray = np.asarray(rgb_to_gray(jnp.asarray(img)))
    for b in range(2):
        ref_gray = cv2.cvtColor(img[b].astype(np.uint8), cv2.COLOR_RGB2GRAY)
        # cv2 rounds through uint8 fixed point; compare float math exactly and
        # the uint8 path loosely.
        ref_float = img[b] @ np.asarray([0.299, 0.587, 0.114], np.float32)
        np.testing.assert_allclose(ours_gray[b], ref_float, atol=1e-2)
        assert np.abs(ours_gray[b] - ref_gray).max() <= 2.0

    ours_lap = np.asarray(laplacian(jnp.asarray(ours_gray)))
    for b in range(2):
        ref_lap = cv2.Laplacian(ours_gray[b].astype(np.float64), cv2.CV_64F)
        np.testing.assert_allclose(ours_lap[b], ref_lap, atol=1e-3)


def test_quality_scores_vs_reference_math(rng):
    B, H, W = 3, 224, 224
    imgs = rng.uniform(0, 255, size=(B, H, W, 3)).astype(np.float32)
    lms = rng.uniform(60, 160, size=(B, 5, 2)).astype(np.float32)
    boxes = np.tile(np.asarray([50, 50, 180, 190], np.float32), (B, 1))
    conf = rng.uniform(0.5, 1.0, size=B).astype(np.float32)

    raw = quality_scores(jnp.asarray(imgs), jnp.asarray(lms), jnp.asarray(boxes), jnp.asarray(conf))
    gray = imgs @ np.asarray([0.299, 0.587, 0.114], np.float32)
    for b in range(B):
        lap = cv2.Laplacian(gray[b].astype(np.float64), cv2.CV_64F)
        np.testing.assert_allclose(float(raw["blur"][b]), lap.var(), rtol=1e-3)
        np.testing.assert_allclose(float(raw["brightness"][b]), gray[b].mean(), rtol=1e-4)
        np.testing.assert_allclose(float(raw["contrast"][b]), gray[b].std(), rtol=1e-3)
        assert float(raw["face_size"][b]) == 130.0
    # Interior landmarks: occlusion matches clipped-window reference math.
    region = min(H, W) // 10
    for b in range(B):
        vs = []
        for x, y in lms[b].astype(int):
            x1, y1 = max(0, x - region // 2), max(0, y - region // 2)
            x2, y2 = min(W, x + region // 2), min(H, y + region // 2)
            vs.append(gray[b][y1:y2, x1:x2].var())
        expected = min(np.mean(vs) / 1000.0, 1.0)
        np.testing.assert_allclose(float(raw["occlusion"][b]), expected, rtol=5e-2)


def test_overall_quality_weights(rng):
    B = 2
    imgs = rng.uniform(0, 255, size=(B, 112, 112, 3)).astype(np.float32)
    lms = rng.uniform(30, 80, size=(B, 5, 2)).astype(np.float32)
    boxes = np.tile(np.asarray([10, 10, 100, 100], np.float32), (B, 1))
    conf = np.ones(B, np.float32)
    overall, valid, raw = overall_quality(
        jnp.asarray(imgs), jnp.asarray(lms), jnp.asarray(boxes), jnp.asarray(conf)
    )
    assert overall.shape == (B,) and valid.shape == (B,)
    assert np.all((np.asarray(overall) >= 0) & (np.asarray(overall) <= 1))


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def test_iou_matrix():
    a = jnp.asarray([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
    m = np.asarray(iou_matrix(a, a))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-6)
    np.testing.assert_allclose(m[0, 1], 25.0 / 100.0, atol=1e-6)


def test_nms_greedy_selection():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [100, 100, 110, 110]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.85, 0.8, 0.05], jnp.float32)
    idx, valid = nms(boxes, scores, iou_threshold=0.4, score_threshold=0.1, max_outputs=4)
    idx, valid = np.asarray(idx), np.asarray(valid)
    kept = idx[valid]
    assert list(kept) == [0, 2]  # 1 suppressed by 0; 3 below score threshold
    assert valid.sum() == 2


def test_nms_batched_shapes():
    boxes = jnp.zeros((3, 16, 4))
    scores = jnp.zeros((3, 16))
    idx, valid = nms_batched(boxes, scores, max_outputs=8)
    assert idx.shape == (3, 8) and valid.shape == (3, 8)
    assert not np.asarray(valid).any()  # all scores below threshold


def test_warp_affine_matmul_matches_gather(rng):
    from deepfake_vit_tpu.ops.warp import warp_affine_matmul

    img = rng.uniform(0, 255, size=(2, 72, 80, 3)).astype(np.float32)
    theta = 0.2
    M = np.asarray(
        [[0.9 * np.cos(theta), -0.9 * np.sin(theta), 6.0],
         [0.9 * np.sin(theta), 0.9 * np.cos(theta), -2.0]], np.float32)
    Ms = np.tile(M, (2, 1, 1))
    ref = warp_affine(jnp.asarray(img), jnp.asarray(Ms), (48, 48))
    exact = warp_affine_matmul(
        jnp.asarray(img), jnp.asarray(Ms), (48, 48),
        compute_dtype=jnp.float32, window=72,
    )
    np.testing.assert_allclose(np.asarray(exact), np.asarray(ref), atol=5e-3)
    fast = warp_affine_matmul(jnp.asarray(img), jnp.asarray(Ms), (48, 48), window=72)
    assert float(jnp.abs(fast - ref).max()) < 2.5  # bf16 taps
