"""Shifted-domain detector generalization suite (VERDICT r3 next #7).

Acceptance on held-out seeds of the SAME renderer is not domain shift;
these tests measure each shipped detector family on perturbations the
training corpus never emits (``data/domain_shift.py``: photometric gain
outside the training range, channel-decorrelated color casts, heavy
noise, JPEG blocking, high-frequency textured backgrounds).

Bars are REGRESSION GUARDS pinned just under the measured round-4 recalls
(deterministic: fixed seeds → identical scenes → identical detections),
not quality claims — the measured table lives in BASELINE.md, including
the honest holes (mtcnn-lite collapses under color_cast; the hog template
under textured backgrounds). The implicit reference bar is buffalo_l's
real-world robustness (``src/preprocessing/face_detector.py:220-227``),
which free-rides on real training data this environment does not have.
"""

import numpy as np
import pytest

from deepfake_vit_tpu.data.domain_shift import SHIFTS, shifted_scene_batch
from deepfake_vit_tpu.preprocessing.detector import (
    FaceDetector,
    create_face_detector,
    default_weights_path,
)

SEED = 20260819
N = 24
ALL_SHIFTS = list(SHIFTS) + ["texture_background"]

# Measured round-4 recalls (n=24, fixed seeds) minus one-scene slack for
# cross-platform numeric drift. Keys: (family, shift).
BARS = {
    ("scrfd", "low_light"): 0.75,          # measured 0.79
    ("scrfd", "overexposed"): 0.87,        # measured 0.92
    ("scrfd", "color_cast"): 0.79,         # measured 0.83
    ("scrfd", "heavy_noise"): 0.91,        # measured 0.96
    ("scrfd", "jpeg"): 0.95,               # measured 1.00
    ("scrfd", "texture_background"): 0.79, # measured 0.83
    ("mtcnn", "low_light"): 0.62,          # measured 0.67
    ("mtcnn", "overexposed"): 0.83,        # measured 0.88
    ("mtcnn", "color_cast"): 0.12,         # measured 0.17 — documented hole
    ("mtcnn", "heavy_noise"): 0.91,        # measured 0.96
    ("mtcnn", "jpeg"): 0.95,               # measured 1.00
    ("mtcnn", "texture_background"): 0.41, # measured 0.46 — documented hole
    ("hog", "low_light"): 0.91,            # measured 0.96
    ("hog", "overexposed"): 0.87,          # measured 0.92
    ("hog", "color_cast"): 0.95,           # measured 1.00
    ("hog", "heavy_noise"): 0.66,          # measured 0.71
    ("hog", "jpeg"): 0.95,                 # measured 1.00
    ("hog", "texture_background"): 0.12,   # measured 0.17 — documented hole
}


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / union


def _recall_scrfd(shift):
    det = FaceDetector(confidence_threshold=0.3, input_size=(320, 320), keep_top_k=1)
    imgs, boxes, _ = shifted_scene_batch(shift, N, SEED, size=320,
                                         min_face=48, max_face=220)
    out = det.detect_batch_raw(imgs.astype(np.float32))
    hits = 0
    for i in range(N):
        valid = out["valid"][i]
        if not valid.any():
            continue
        best = int(np.argmax(out["scores"][i][valid]))
        if _iou(out["boxes"][i][valid][best], boxes[i]) > 0.5:
            hits += 1
    return hits / N


def _recall_mtcnn(shift):
    det = create_face_detector(
        {"model": "mtcnn", "confidence_threshold": 0.3,
         "scrfd": {"input_size": [160, 160]}}
    )
    imgs, boxes, _ = shifted_scene_batch(shift, N, SEED + 1, size=160,
                                         min_face=36, max_face=110)
    hits = 0
    for i in range(N):
        r = det.detect(imgs[i])
        if r is not None and _iou(r["bbox"], boxes[i]) > 0.5:
            hits += 1
    return hits / N


def _recall_hog(shift):
    from deepfake_vit_tpu.models.hog_detector import HogFaceDetector

    det = HogFaceDetector(input_size=(320, 320), confidence_threshold=0.5,
                          upsample=1)
    imgs, boxes, _ = shifted_scene_batch(shift, N, SEED + 2, size=320,
                                         min_face=48, max_face=180)
    results = det.batch_detect(list(imgs))
    return sum(
        1 for r, gt in zip(results, boxes)
        if r is not None and _iou(r["bbox"], gt) > 0.5
    ) / N


RECALL_FNS = {"scrfd": _recall_scrfd, "mtcnn": _recall_mtcnn, "hog": _recall_hog}


@pytest.mark.slow
@pytest.mark.parametrize("family", ["scrfd", "mtcnn", "hog"])
def test_shifted_domain_recall(family):
    if default_weights_path(family) is None:
        pytest.skip(f"trained {family} weights not present")
    recalls = {}
    for shift in ALL_SHIFTS:
        recalls[shift] = RECALL_FNS[family](shift)
        assert recalls[shift] >= BARS[(family, shift)], (
            f"{family}/{shift}: recall {recalls[shift]:.2f} regressed below "
            f"the pinned bar {BARS[(family, shift)]:.2f}"
        )
    # Production family must also hold an absolute robustness floor.
    if family == "scrfd":
        mean = float(np.mean(list(recalls.values())))
        assert mean >= 0.80, f"scrfd mean shifted recall {mean:.2f} < 0.80"
        assert min(recalls.values()) >= 0.70, f"scrfd worst shift: {recalls}"


def test_shifts_change_statistics():
    """Sanity: each photometric shift materially moves the image statistics
    it targets (guards against a silent no-op making the suite vacuous)."""
    rng = np.random.default_rng(0)
    from deepfake_vit_tpu.data.synth_faces import render_scene

    img, _, _ = render_scene(rng, size=160, max_faces=1, p_empty=0.0)
    base_mean = img.mean()
    low = SHIFTS["low_light"](img, np.random.default_rng(1))
    over = SHIFTS["overexposed"](img, np.random.default_rng(1))
    assert low.mean() < 0.6 * base_mean
    assert over.mean() > 1.2 * base_mean
    cast = SHIFTS["color_cast"](img, np.random.default_rng(1))
    ratios = cast.astype(np.float32).mean((0, 1)) / np.maximum(
        img.astype(np.float32).mean((0, 1)), 1e-3)
    assert ratios.max() / ratios.min() > 1.5
    noisy = SHIFTS["heavy_noise"](img, np.random.default_rng(1))
    assert (noisy.astype(np.int32) - img.astype(np.int32)).std() > 12
    jp = SHIFTS["jpeg"](img, np.random.default_rng(1))
    assert jp.shape == img.shape and not np.array_equal(jp, img)
