"""Parity gates for the int8 SCRFD detector graph (models/scrfd_int8.py).

The serving path may run the detector's 3×3 convs as s8×s8→s32 MXU
convolutions; these tests hold the quantized graph to the bf16 flax
detector on the TRAINED weights: decoded best-face box IoU, landmark and
confidence deltas, plus the full pipeline integration. Mirrors the int8
classify-tail gates (tests/test_int8_tail.py) — the reference's analog
is TensorRT-style INT8 deployment of its ONNX detector session
(``src/preprocessing/face_detector.py:195-276``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from deepfake_vit_tpu.data.synth_faces import render_scene
from deepfake_vit_tpu.models.scrfd import ScrfdDetector
from deepfake_vit_tpu.models.scrfd_int8 import (
    ScrfdInt8Runner,
    calibrate_det_act_scales,
)
from deepfake_vit_tpu.ops.anchors import (
    all_anchor_centers,
    decode_boxes,
    decode_landmarks,
)
from deepfake_vit_tpu.preprocessing.detector import (
    DEFAULT_WEIGHTS,
    default_weights_path,
)

pytestmark = pytest.mark.skipif(
    not DEFAULT_WEIGHTS.exists(), reason="trained detector weights not present"
)

SIZE = 320


@pytest.fixture(scope="module")
def det_vars():
    det = ScrfdDetector(dtype=jnp.bfloat16)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    with open(default_weights_path(), "rb") as f:
        return serialization.from_state_dict(
            dv, serialization.msgpack_restore(f.read())
        )


@pytest.fixture(scope="module")
def scenes():
    rng = np.random.default_rng(987)
    out = []
    while len(out) < 8:
        img, boxes, kps = render_scene(
            rng, size=SIZE, max_faces=1, min_face=48, max_face=220, p_empty=0.0
        )
        if len(boxes):
            out.append(img)
    return np.stack(out)


def _best_face(outs):
    centers, strides = all_anchor_centers((SIZE, SIZE))
    centers, strides = jnp.asarray(centers), jnp.asarray(strides)
    s = jnp.concatenate(
        [jax.nn.sigmoid(outs[k]["scores"]) for k in (8, 16, 32)], axis=1
    )
    boxes = decode_boxes(
        centers, strides, jnp.concatenate([outs[k]["bbox"] for k in (8, 16, 32)], axis=1)
    )
    lms = decode_landmarks(
        centers, strides, jnp.concatenate([outs[k]["kps"] for k in (8, 16, 32)], axis=1)
    )
    i = jnp.argmax(s, axis=1)
    conf = jnp.take_along_axis(s, i[:, None], 1)[:, 0]
    bb = jnp.take_along_axis(boxes, i[:, None, None], 1)[:, 0]
    lm = jnp.take_along_axis(lms, i[:, None, None, None], 1)[:, 0]
    return np.asarray(conf), np.asarray(bb), np.asarray(lm)


def _iou(a, b):
    x1, y1 = np.maximum(a[:, 0], b[:, 0]), np.maximum(a[:, 1], b[:, 1])
    x2, y2 = np.minimum(a[:, 2], b[:, 2]), np.minimum(a[:, 3], b[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = lambda r: (r[:, 2] - r[:, 0]) * (r[:, 3] - r[:, 1])
    return inter / (area(a) + area(b) - inter)


def test_int8_detector_best_face_parity(det_vars, scenes):
    det = ScrfdDetector(dtype=jnp.bfloat16)
    x = (jnp.asarray(scenes, jnp.float32) - 127.5) / 128.0
    conf_r, box_r, lm_r = _best_face(det.apply(det_vars, x, train=False))

    # Dynamic per-image activation scales.
    conf_q, box_q, lm_q = _best_face(ScrfdInt8Runner(det_vars)(x))
    assert _iou(box_r, box_q).min() > 0.9
    assert np.abs(conf_r - conf_q).max() < 0.06
    assert np.abs(lm_r - lm_q).max() < 3.0  # px at 320²

    # Static calibrated scales (calibrated on the same distribution).
    scales = calibrate_det_act_scales(det_vars, [x])
    conf_s, box_s, lm_s = _best_face(
        ScrfdInt8Runner(det_vars, act_scales=scales)(x)
    )
    assert _iou(box_r, box_s).min() > 0.9
    assert np.abs(conf_r - conf_s).max() < 0.06
    assert np.abs(lm_r - lm_s).max() < 3.0


@pytest.mark.slow
def test_int8_detector_acceptance_recall(det_vars):
    """The detection acceptance bar (recall@IoU0.5 ≥ 0.9, landmark err
    < 10% IED) must hold with the int8 graph — same bars as
    test_detector_trained.py, held-out seed."""
    rng = np.random.default_rng(20260816 + 3)
    scenes = []
    while len(scenes) < 24:
        img, boxes, kps = render_scene(
            rng, size=SIZE, max_faces=1, min_face=48, max_face=220, p_empty=0.0
        )
        if len(boxes):
            scenes.append((img, boxes, kps))
    imgs = np.stack([s[0] for s in scenes])
    x = (jnp.asarray(imgs, jnp.float32) - 127.5) / 128.0
    scales = calibrate_det_act_scales(det_vars, [x[:8]])
    conf, bb, lm = _best_face(ScrfdInt8Runner(det_vars, act_scales=scales)(x))

    hits, lm_errs = 0, []
    for i, (_, boxes, kps) in enumerate(scenes):
        ious = [_iou(bb[i : i + 1], np.asarray(b)[None])[0] for b in boxes]
        gi = int(np.argmax(ious))
        if ious[gi] > 0.5 and conf[i] >= 0.3:
            hits += 1
            ied = float(np.linalg.norm(kps[gi][0] - kps[gi][1]))
            lm_errs.append(
                float(np.linalg.norm(lm[i] - kps[gi], axis=1).mean()) / ied
            )
    assert hits / len(scenes) >= 0.9, f"int8 recall {hits}/{len(scenes)}"
    assert np.mean(lm_errs) < 0.10, f"int8 landmark err {np.mean(lm_errs):.3f} IED"


@pytest.mark.slow
def test_pipeline_int8_detector_integration():
    """FusedPipeline(use_int8_detector=True) agrees with the bf16 pipeline:
    same has_face decisions, close boxes/probs — including the folded-stem
    serving path (serving 2× detection canvas) and calibration."""
    from deepfake_vit_tpu.e2e import FusedPipeline

    cfg = {"model": {"backbone": {"variant": "b0"}, "num_classes": 2}}
    kw = dict(
        detection_input_size=(160, 160),
        serving_size=(320, 320),
        output_size=(224, 224),
        confidence_threshold=0.3,
        dtype=jnp.bfloat16,
    )
    base = FusedPipeline(cfg, **kw)
    quant = FusedPipeline(cfg, use_int8_detector=True, **kw)

    rng = np.random.default_rng(555)
    frames = np.stack(
        [
            render_scene(rng, size=320, max_faces=1, min_face=64, max_face=200,
                         p_empty=0.0)[0]
            for _ in range(4)
        ]
    ).astype(np.float32)

    det_vars, model_vars = base.load_variables(jax.random.PRNGKey(0))
    quant.calibrate_int8_detector(det_vars, frames)
    out_b = jax.device_get(base.forward(det_vars, model_vars, frames))
    out_q = jax.device_get(quant.forward(det_vars, model_vars, frames))

    assert (out_b["has_face"] == out_q["has_face"]).all()
    assert np.abs(out_b["confidence"] - out_q["confidence"]).max() < 0.06
    hit = out_b["has_face"]
    assert _iou(out_b["bbox"][hit], out_q["bbox"][hit]).min() > 0.85
    # Classify runs on near-identical crops → probabilities stay close.
    assert np.abs(out_b["probs"] - out_q["probs"]).max() < 0.08


@pytest.mark.slow
def test_pipeline_int8_detector_sharded():
    """The int8 detector graph shards over the data axis like the bf16 one
    (run_pipeline serves through make_sharded): same outputs as plain jit
    on an 8-device virtual mesh."""
    from deepfake_vit_tpu.e2e import FusedPipeline
    from deepfake_vit_tpu.parallel import data_parallel_mesh

    cfg = {"model": {"backbone": {"variant": "b0"}, "num_classes": 2}}
    pipe = FusedPipeline(
        cfg,
        detection_input_size=(160, 160),
        output_size=(224, 224),
        confidence_threshold=0.3,
        use_int8_detector=True,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(777)
    frames = np.stack(
        [
            render_scene(rng, size=160, max_faces=1, min_face=48, max_face=110,
                         p_empty=0.0)[0]
            for _ in range(8)
        ]
    ).astype(np.float32)
    det_vars, model_vars = pipe.load_variables(jax.random.PRNGKey(0))
    pipe.calibrate_int8_detector(det_vars, frames)

    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8, "conftest should provide 8 virtual devices"
    sharded = pipe.make_sharded(mesh)
    out_j = jax.device_get(pipe.forward(det_vars, model_vars, frames))
    out_s = jax.device_get(sharded(det_vars, model_vars, frames))
    assert (out_j["has_face"] == out_s["has_face"]).all()
    np.testing.assert_allclose(
        out_s["fake_prob"], out_j["fake_prob"], atol=1e-2
    )
