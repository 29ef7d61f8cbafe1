"""DeepfakePredictor unit tests (the per-file inference path behind
scripts/predict.py — reference ``task.ipynb`` cell 16 semantics)."""

import numpy as np
import pytest

from deepfake_vit_tpu.inference import DeepfakePredictor


@pytest.fixture(scope="module")
def predictor():
    model_cfg = {
        "model": {
            "feature_extractor": {"variant": "b0"},
            "classifier": {"hidden_dims": [16], "num_classes": 2},
        }
    }
    pre_cfg = {
        "detection": {
            "model": "scrfd",
            "confidence_threshold": 0.5,
            "scrfd": {"input_size": [128, 128], "max_detections": 4},
        },
        "alignment": {"output_size": [64, 64]},
    }
    import jax.numpy as jnp

    return DeepfakePredictor(model_cfg, pre_cfg, frame_count=5, max_batch=8, dtype=jnp.float32)


def _fake_det(n=1):
    return {
        "bbox": np.asarray([20, 20, 90, 100], np.float32),
        "landmarks": np.asarray(
            [[40, 45], [70, 45], [55, 65], [45, 85], [65, 85]], np.float32
        ),
        "confidence": 0.9,
        "num_faces": n,
    }


def test_no_faces_returns_real(predictor, rng, monkeypatch):
    monkeypatch.setattr(predictor.detector, "batch_detect", lambda frames: [None] * len(frames))
    out = predictor.predict_frames([rng.uniform(0, 255, (120, 120, 3)).astype(np.uint8)])
    assert out == {"label": 0, "fake_prob": 0.0, "frame_probs": [], "num_faces": 0}


def test_clip_mean_threshold(predictor, rng, monkeypatch):
    monkeypatch.setattr(
        predictor.detector, "batch_detect", lambda frames: [_fake_det() for _ in frames]
    )
    frames = [rng.uniform(0, 255, (120, 120, 3)).astype(np.uint8) for _ in range(5)]
    out = predictor.predict_frames(frames)
    assert out["num_faces"] == 5
    assert len(out["frame_probs"]) == 5
    mean = float(np.mean(out["frame_probs"]))
    np.testing.assert_allclose(out["fake_prob"], mean, atol=1e-5)
    assert out["label"] == int(out["fake_prob"] >= 0.5)


def test_partial_detection_failures(predictor, rng, monkeypatch):
    """Frames without faces are excluded from the mean (reference semantics)."""
    dets = [_fake_det(), None, _fake_det(), None, None]
    monkeypatch.setattr(predictor.detector, "batch_detect", lambda frames: dets[: len(frames)])
    frames = [rng.uniform(0, 255, (120, 120, 3)).astype(np.uint8) for _ in range(5)]
    out = predictor.predict_frames(frames)
    assert out["num_faces"] == 2
    assert len(out["frame_probs"]) == 2


def test_padding_does_not_change_result(predictor, rng, monkeypatch):
    """3 frames pad to max_batch=8; padded slots must not affect the mean."""
    monkeypatch.setattr(
        predictor.detector, "batch_detect", lambda frames: [_fake_det() for _ in frames]
    )
    frames = [rng.uniform(0, 255, (120, 120, 3)).astype(np.uint8) for _ in range(3)]
    out = predictor.predict_frames(frames)
    mean = float(np.mean(out["frame_probs"]))
    np.testing.assert_allclose(out["fake_prob"], mean, atol=1e-5)


@pytest.mark.slow
def test_fallback_path_hog_plus_vit():
    """The reference's fallback submission stack — dlib-HOG detection +
    ViT classification (task(less_cpu_intensive_ver).ipynb cell 15) —
    driven end-to-end from config alone: ``detection.model: "hog"`` +
    ``model.type: "vit"``. A rendered face must be detected by the
    shipped template, cropped via the synthesized canonical landmarks,
    and classified by the ViT in one predict_frames call."""
    import jax.numpy as jnp

    from deepfake_vit_tpu.data.synth_faces import render_scene
    from deepfake_vit_tpu.models.hog_detector import HogFaceDetector
    from deepfake_vit_tpu.models.vit import ViTClassifier
    from deepfake_vit_tpu.preprocessing.detector import default_weights_path

    if default_weights_path("hog") is None:
        pytest.skip("hog template weights not present")

    model_cfg = {
        "model": {
            "type": "vit",
            "feature_extractor": {"variant": "tiny16", "image_size": 224},
            "classifier": {"num_classes": 2},
        }
    }
    pre_cfg = {
        "detection": {
            "model": "hog",
            "confidence_threshold": 0.5,
            "scrfd": {"input_size": [320, 320]},
        },
        "alignment": {"output_size": [224, 224]},
    }
    pred = DeepfakePredictor(
        model_cfg, pre_cfg, frame_count=5, max_batch=4, dtype=jnp.float32
    )
    assert isinstance(pred.model, ViTClassifier)
    assert isinstance(pred.detector, HogFaceDetector)

    scene_rng = np.random.default_rng(99)
    img, boxes, _ = render_scene(
        scene_rng, size=320, max_faces=1, min_face=60, max_face=150, p_empty=0.0
    )
    out = pred.predict_image(img)
    assert out["num_faces"] == 1
    assert 0.0 <= out["fake_prob"] <= 1.0
    assert out["label"] in (0, 1)
