"""Preprocessing pipeline tests (reference parity: pipeline contract of
``src/preprocessing/pipeline.py``, aligner semantics of ``face_aligner.py``,
quality-checker result schema of ``quality_checker.py:125-130``)."""

import numpy as np
import pytest

from deepfake_vit_tpu.preprocessing import (
    FaceAligner,
    NormalizationProcessor,
    PreprocessingOutput,
    PreprocessingPipeline,
    QualityChecker,
)
from deepfake_vit_tpu.preprocessing.detector import FaceDetector


@pytest.fixture(scope="module")
def pipeline_config():
    return {
        "detection": {
            "model": "scrfd",
            "confidence_threshold": 0.5,
            "nms_threshold": 0.4,
            "keep_top_k": 1,
            "scrfd": {"input_size": [160, 160], "max_detections": 8},
        },
        "alignment": {"output_size": [224, 224], "method": "similarity"},
        "quality": {"enabled": True},
        "pipeline": {"normalize": {"enabled": True}, "save_format": "png"},
    }


def synthetic_face_image(rng, h=200, w=200):
    """Textured image so blur/contrast checks pass."""
    return rng.uniform(0, 255, size=(h, w, 3)).astype(np.uint8)


def fake_detection(scale=1.0):
    lms = np.asarray(
        [[70, 80], [130, 80], [100, 110], [80, 140], [120, 140]], np.float32
    ) * scale
    return {
        "bbox": np.asarray([50, 50, 150, 170], np.float32) * scale,
        "landmarks": lms,
        "confidence": 0.95,
        "num_faces": 1,
    }


def test_aligner_maps_landmarks_to_template(rng):
    aligner = FaceAligner(output_size=(224, 224))
    img = synthetic_face_image(rng)
    lms = fake_detection()["landmarks"]
    aligned, tform = aligner.align(img.astype(np.float32), lms)
    assert aligned.shape == (224, 224, 3)
    aligned_lms = aligner.get_aligned_landmarks(lms, tform)
    # Similarity transform cannot place all 5 exactly; quality should be high.
    q = aligner.compute_alignment_quality(aligned_lms)
    assert 0.5 < q <= 1.0
    # Eyes should land near the template eye row (y ≈ 0.32·224 ≈ 71.7).
    assert abs(aligned_lms[0, 1] - 71.7) < 15
    assert abs(aligned_lms[1, 1] - 71.7) < 15


def test_aligner_batch_matches_single(rng):
    aligner = FaceAligner(output_size=(112, 112))
    imgs = np.stack([synthetic_face_image(rng).astype(np.float32) for _ in range(4)])
    lms = np.stack([fake_detection()["landmarks"] for _ in range(4)])
    batch_aligned, batch_lms, _ = aligner.align_batch(imgs, lms)
    single, _ = aligner.align(imgs[0], lms[0])
    np.testing.assert_allclose(batch_aligned[0], single, atol=1e-3)


def test_quality_checker_contract(rng):
    qc = QualityChecker({"enabled": True})
    img = synthetic_face_image(rng, 224, 224)
    det = fake_detection()
    result = qc.check_quality(img, det["landmarks"], det)
    assert set(result.keys()) == {"is_valid", "overall_score", "scores", "reasons"}
    assert 0.0 <= result["overall_score"] <= 1.0
    assert result["is_valid"]  # noisy texture passes all checks

    # Flat gray image: blur + contrast + occlusion failures.
    flat = np.full((224, 224, 3), 128, np.uint8)
    result = qc.check_quality(flat, det["landmarks"], det)
    assert not result["is_valid"]
    assert any("blurry" in r.lower() for r in result["reasons"])


def test_quality_checker_disabled(rng):
    qc = QualityChecker({"enabled": False})
    det = fake_detection()
    result = qc.check_quality(np.zeros((64, 64, 3), np.uint8), det["landmarks"], det)
    assert result["is_valid"] and result["overall_score"] == 1.0


def test_normalization_roundtrip(rng):
    proc = NormalizationProcessor()
    img = rng.uniform(0, 255, size=(8, 8, 3)).astype(np.uint8)
    normed = proc.normalize(img)
    back = proc.denormalize(normed, to_uint8=True)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


@pytest.fixture(scope="module")
def pipeline(pipeline_config):
    return PreprocessingPipeline(pipeline_config)


def test_pipeline_no_face_failure(pipeline, rng, monkeypatch):
    monkeypatch.setattr(
        pipeline.detector, "batch_detect", lambda images: [None] * len(images)
    )
    out = pipeline.process_image(synthetic_face_image(rng), image_id="x", dataset="d", label="real")
    assert not out.success
    assert out.failure_reason == "no_face_detected"


def test_pipeline_process_save_load_roundtrip(pipeline, rng, tmp_path, monkeypatch):
    monkeypatch.setattr(
        pipeline.detector,
        "batch_detect",
        lambda images: [fake_detection() for _ in images],
    )
    img = synthetic_face_image(rng)
    out = pipeline.process_image(img, image_id="000001", dataset="genai", label="fake")
    assert out.success
    assert out.aligned_face.shape == (224, 224, 3)
    assert out.landmarks.shape == (5, 2)
    assert out.tform.shape == (2, 3)
    assert 0 <= out.quality_score <= 1

    paths = pipeline.save_output(out, tmp_path)
    assert (tmp_path / paths["face_path"]).exists()
    assert (tmp_path / paths["landmark_path"]).exists()
    assert (tmp_path / paths["metadata_path"]).exists()

    loaded = pipeline.load_output(tmp_path, "genai_fake_000001")
    assert loaded.aligned_face.shape == (224, 224, 3)
    np.testing.assert_allclose(loaded.landmarks, out.landmarks, atol=1e-4)
    assert loaded.label == "fake" and loaded.dataset == "genai"

    model_in = loaded.to_model_input()
    assert model_in["image"].shape == (224, 224, 3)
    assert model_in["image"].dtype == np.float32

    stats = pipeline.get_statistics()
    assert stats["total_processed"] >= 1
    assert 0 <= stats["success_rate"] <= 1


def test_detector_end_to_end_shapes(rng):
    """Random-weight detector: exercises the full jitted graph + host API."""
    det = FaceDetector(
        confidence_threshold=0.99,  # random net rarely this confident
        input_size=(160, 160),
        max_detections=8,
    )
    img = synthetic_face_image(rng, 300, 400)
    raw = det.detect_batch_raw(np.zeros((2, 160, 160, 3), np.float32))
    assert raw["boxes"].shape == (2, 8, 4)
    assert raw["landmarks"].shape == (2, 8, 5, 2)
    assert raw["scores"].shape == (2, 8)
    result = det.detect(img)
    assert result is None or set(result.keys()) == {"bbox", "landmarks", "confidence", "num_faces"}


def test_mtcnn_lite_family(rng):
    """The second detector family (models/mtcnn_lite.py): config key
    'mtcnn' builds a real lightweight net sharing the FaceDetector host
    API and decode machinery (reference face_detector.py:12-192)."""
    from deepfake_vit_tpu.preprocessing.detector import create_face_detector

    det = create_face_detector(
        {"model": "mtcnn", "confidence_threshold": 0.99,
         "scrfd": {"input_size": [128, 128], "max_detections": 4}}
    )
    assert det.model_name == "mtcnn"
    import jax

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(det.variables["params"])
    )
    assert n_params < 100_000  # genuinely lightweight (SCRFD is ~3M)
    raw = det.detect_batch_raw(np.zeros((2, 128, 128, 3), np.float32))
    assert raw["boxes"].shape == (2, 4, 4)
    assert raw["landmarks"].shape == (2, 4, 5, 2)
    result = det.detect(synthetic_face_image(rng, 200, 200))
    assert result is None or set(result.keys()) == {"bbox", "landmarks", "confidence", "num_faces"}


def test_fused_batch_matches_modular_stages(rng):
    """The one-dispatch fused graph (detect→best-face→quality→align,
    pipeline._get_fused) must reproduce the modular per-stage path
    bitwise: same detections, bit-identical uint8 faces, same quality
    scores. The fused path triggers when frame shape == detection canvas
    (uniform corpora)."""
    cfg = {
        "detection": {
            "model": "scrfd",
            "confidence_threshold": 0.0,
            "nms_threshold": 0.4,
            "keep_top_k": 1,
            "scrfd": {"input_size": [160, 160], "max_detections": 8},
        },
        "alignment": {"output_size": [224, 224], "method": "similarity"},
        "quality": {"enabled": True},
        "pipeline": {"normalize": {"enabled": True}, "save_format": "png"},
    }
    p = PreprocessingPipeline(cfg)
    images = [synthetic_face_image(rng, 160, 160) for _ in range(3)]

    fused = p.process_batch(
        [im.copy() for im in images],
        image_ids=["a", "b", "c"], datasets=["d"] * 3, labels=["real"] * 3,
    )

    # Modular reference: the same stage functions called one at a time.
    dets = p.detector.batch_detect([im.copy() for im in images])
    assert all(d is not None for d in dets)  # conf 0.0 always keeps top-1
    imgs = np.stack(images)
    lms = np.stack([d["landmarks"] for d in dets])
    qs = p.quality_checker.check_quality_batch(
        imgs, lms,
        np.stack([d["bbox"] for d in dets]),
        np.asarray([d["confidence"] for d in dets], np.float32),
    )
    aligned, aligned_lms, tforms = p.aligner.align_batch(imgs, lms, out_uint8=True)

    for i, out in enumerate(fused):
        assert out.success
        np.testing.assert_allclose(out.bbox, dets[i]["bbox"], atol=1e-4)
        np.testing.assert_allclose(
            out.original_landmarks, dets[i]["landmarks"], atol=1e-4
        )
        assert abs(out.confidence - dets[i]["confidence"]) < 1e-6
        np.testing.assert_array_equal(out.aligned_face, aligned[i])
        np.testing.assert_allclose(out.landmarks, aligned_lms[i], atol=1e-4)
        np.testing.assert_allclose(out.tform, tforms[i], atol=1e-6)
        assert abs(out.quality_score - qs[i]["overall_score"]) < 1e-5
        assert out.quality_details["reasons"] == qs[i]["reasons"]
