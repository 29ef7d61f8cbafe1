"""Cascade stage-2 (RefineNet) tests: decode math, jittable cascade tail,
sampler targets, trainer step, and the trained-weights acceptance bars.

Reference counterpart: facenet-pytorch MTCNN's R/O-Net refinement stages
with thresholds [0.6, 0.7, 0.8]
(``src/preprocessing/face_detector.py:33-39``). There the cascade re-enters
the host per stage on a dynamic proposal list; here it is one fused
static-shape stage appended to the detection jit graph
(models/refine_net.py), so the tests assert the SEMANTICS (re-score,
box regression, landmark refinement, last-stage gate) on fixed slates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_vit_tpu.models.refine_net import (
    REFINE_CROP,
    RefineNet,
    apply_box_deltas,
    decode_refined_kps,
    refine_detections,
    square_boxes,
)


def test_square_boxes_geometry():
    boxes = jnp.array([[10.0, 20.0, 50.0, 40.0]])  # w=40, h=20
    sq = np.asarray(square_boxes(boxes, margin=0.15))[0]
    side = sq[2] - sq[0]
    assert np.isclose(side, sq[3] - sq[1])  # square
    assert np.isclose(side, 40.0 * 1.3)  # max(w,h)·(1+2·margin)
    assert np.isclose((sq[0] + sq[2]) / 2, 30.0)  # center preserved
    assert np.isclose((sq[1] + sq[3]) / 2, 30.0)


def test_box_delta_roundtrip():
    """Encoding a GT against a square and decoding returns the GT."""
    sq = jnp.array([[0.0, 0.0, 100.0, 100.0], [50.0, 60.0, 150.0, 160.0]])
    gt = jnp.array([[12.0, 8.0, 88.0, 95.0], [70.0, 75.0, 140.0, 150.0]])
    side = sq[:, 2:3] - sq[:, 0:1]
    deltas = (gt - sq) / side  # corner-relative MTCNN encoding
    dec = apply_box_deltas(sq, deltas)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), atol=1e-4)


def test_kps_decode_roundtrip():
    sq = jnp.array([[20.0, 30.0, 120.0, 130.0]])
    pts = np.random.default_rng(0).uniform(0.2, 0.8, (1, 5, 2)).astype(np.float32)
    kps_flat = jnp.asarray(pts.reshape(1, 10))
    dec = np.asarray(decode_refined_kps(sq, kps_flat))[0]
    expected = np.array([20.0, 30.0]) + pts[0] * 100.0
    np.testing.assert_allclose(dec, expected, atol=1e-4)


def _fake_dets(B=2, D=8, K=4):
    rng = np.random.default_rng(3)
    boxes = rng.uniform(10, 60, (B, D, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(15, 40, (B, D, 2))
    scores = np.linspace(0.9, 0.1, D, dtype=np.float32)[None].repeat(B, 0)
    valid = np.ones((B, D), bool)
    valid[:, D - 2 :] = False
    lms = rng.uniform(10, 90, (B, D, 5, 2)).astype(np.float32)
    return {
        "boxes": jnp.asarray(boxes),
        "scores": jnp.asarray(scores),
        "landmarks": jnp.asarray(lms),
        "valid": jnp.asarray(valid),
    }


def test_refine_detections_masks_and_passthrough():
    """Slots ≥ K pass through bitwise; refined slots gate on the refined
    score; invalid proposal slots stay invalid."""
    B, D, K = 2, 8, 4
    dets = _fake_dets(B, D, K)
    images = jnp.zeros((B, 96, 96, 3), jnp.float32)

    # Deterministic fake refiner: score slot 0 high, others very low.
    def fake_apply(variables, crops):
        n = crops.shape[0]
        score = jnp.where(jnp.arange(n) % K == 0, 4.0, -4.0)  # sigmoid→~0.98/0.018
        return {
            "score": score.astype(jnp.float32),
            "box": jnp.zeros((n, 4), jnp.float32),
            "kps": jnp.full((n, 10), 0.5, jnp.float32),
        }

    out = jax.jit(
        lambda im, d: refine_detections(fake_apply, {}, im, d, top_k=K)
    )(images, dets)

    # Pass-through tail identical.
    np.testing.assert_array_equal(
        np.asarray(out["boxes"][:, K:]), np.asarray(dets["boxes"][:, K:])
    )
    np.testing.assert_array_equal(
        np.asarray(out["valid"][:, K:]), np.asarray(dets["valid"][:, K:])
    )
    v = np.asarray(out["valid"][:, :K])
    # Slot 0 survives the 0.7 gate; slots 1-3 are re-scored ~0.018 → dropped.
    assert v[:, 0].all() and not v[:, 1:].any()
    s = np.asarray(out["scores"][:, :K])
    assert (s[:, 0] > 0.9).all() and (s[:, 1:] == 0.0).all()
    # Refined box for slot 0 is the margin square (zero deltas), landmarks
    # are the square centers (all-0.5 crop coords).
    sq = np.asarray(square_boxes(dets["boxes"][:, :K]))
    np.testing.assert_allclose(np.asarray(out["boxes"][:, 0]), sq[:, 0], atol=1e-3)
    centers = (sq[:, 0, :2] + sq[:, 0, 2:]) / 2
    lm = np.asarray(out["landmarks"][:, 0])
    np.testing.assert_allclose(lm.mean(axis=1), centers, atol=1e-3)


def test_refine_net_forward_shapes():
    net = RefineNet()
    x = jnp.zeros((6, REFINE_CROP, REFINE_CROP, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out["score"].shape == (6,)
    assert out["box"].shape == (6, 4)
    assert out["kps"].shape == (6, 10)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert n_params < 5e5, f"refiner should stay tiny, got {n_params}"


def test_detector_with_refine_contract():
    """FaceDetector(refine=True) keeps the padded-dets contract end-to-end
    (random weights: shapes/dtypes only)."""
    from deepfake_vit_tpu.preprocessing.detector import FaceDetector

    det = FaceDetector(
        input_size=(128, 128), confidence_threshold=0.0, max_detections=16,
        pretrained=False, refine=True, refine_threshold=0.0, refine_top_k=4,
    )
    images = np.random.default_rng(0).integers(
        0, 255, (2, 128, 128, 3), np.uint8
    )
    out = det.detect_batch_raw(images)
    assert out["boxes"].shape == (2, 16, 4)
    assert out["scores"].shape == (2, 16)
    assert out["landmarks"].shape == (2, 16, 5, 2)
    assert out["valid"].shape == (2, 16)


def test_sampler_targets_decode_to_gt():
    """Positive-slot regression targets decode back to the GT box/landmarks
    through the inference-path decoders (training/serving consistency)."""
    from deepfake_vit_tpu.training.refinement import sample_refine_targets

    rng = np.random.default_rng(5)
    B, G = 3, 2
    boxes = np.zeros((B, G, 4), np.float32)
    kps = np.zeros((B, G, 5, 2), np.float32)
    valid = np.ones((B, G), np.float32)
    for b in range(B):
        for g in range(G):
            x1, y1 = rng.uniform(20, 120, 2)
            w, h = rng.uniform(30, 60, 2)
            boxes[b, g] = [x1, y1, x1 + w, y1 + h]
            kps[b, g] = np.stack(
                [rng.uniform(x1, x1 + w, 5), rng.uniform(y1, y1 + h, 5)], -1
            )
    det_batch = {
        "image": np.zeros((B, 200, 200, 3), np.float32),
        "boxes": boxes,
        "kps": kps,
        "valid": valid,
    }
    t = sample_refine_targets(det_batch, rng, crops_per_image=16)
    pos = (t["box_mask"] > 0) & (t["cls"] > 0)
    assert pos.sum() > 0, "sampler produced no positives in 48 slots"

    dec = np.asarray(
        apply_box_deltas(jnp.asarray(t["crop_boxes"]), jnp.asarray(t["box_t"]))
    )
    dec_k = np.asarray(
        decode_refined_kps(jnp.asarray(t["crop_boxes"]), jnp.asarray(t["kps_t"]))
    )
    for b, k in zip(*np.nonzero(pos)):
        ious = [
            _iou_np(dec[b, k], boxes[b, g]) for g in range(G)
        ]
        g = int(np.argmax(ious))
        np.testing.assert_allclose(dec[b, k], boxes[b, g], atol=0.5)
        if t["kps_mask"][b, k]:
            np.testing.assert_allclose(dec_k[b, k], kps[b, g], atol=0.5)


def _iou_np(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(union, 1e-9)


def test_refiner_train_step_learns():
    """A few steps on a fixed slate reduce the loss (trainer wiring sanity)."""
    import optax

    from deepfake_vit_tpu.training.refinement import (
        make_refiner_train_step,
        sample_refine_targets,
    )

    rng = np.random.default_rng(7)
    B = 4
    images = rng.uniform(0, 255, (B, 96, 96, 3)).astype(np.float32)
    boxes = np.tile(np.array([[24.0, 24.0, 72.0, 72.0]], np.float32), (B, 1))[:, None]
    kps = np.tile(
        np.array([[[36, 40], [60, 40], [48, 52], [38, 62], [58, 62]]], np.float32),
        (B, 1, 1),
    )[:, None]
    det_batch = {
        "image": images,
        "boxes": boxes,
        "kps": kps,
        "valid": np.ones((B, 1), np.float32),
    }
    batch = sample_refine_targets(det_batch, rng, crops_per_image=8)

    net = RefineNet()
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, REFINE_CROP, REFINE_CROP, 3))
    )
    opt = optax.adam(3e-3)
    opt_state = opt.init(variables["params"])
    step = make_refiner_train_step(net, opt)

    params, stats = variables["params"], variables["batch_stats"]
    first = None
    for _ in range(12):
        params, stats, opt_state, losses = step(params, stats, opt_state, batch)
        if first is None:
            first = float(losses["total"])
    last = float(losses["total"])
    assert last < first * 0.8, f"loss did not drop: {first:.4f} → {last:.4f}"


# ---------------------------------------------------------------------------
# Acceptance bars for trained cascade weights (promotion-gated like the
# other families: scripts/promote_weights.py --model refine).
# ---------------------------------------------------------------------------

from deepfake_vit_tpu.preprocessing.detector import default_weights_path

refine_weights = pytest.mark.skipif(
    default_weights_path("refine") is None or default_weights_path("scrfd") is None,
    reason="trained refine (or scrfd proposal) weights not present",
)

SIZE = 320
HELDOUT_SEED = 20260816  # shared with test_detector_trained.py


@pytest.fixture(scope="module")
def cascade_scenes():
    from deepfake_vit_tpu.data.synth_faces import render_scene

    rng = np.random.default_rng(HELDOUT_SEED + 21)
    scenes = []
    while len(scenes) < 24:
        img, boxes, kps = render_scene(
            rng, size=SIZE, max_faces=1, min_face=48, max_face=220, p_empty=0.0
        )
        if len(boxes):
            scenes.append((img, boxes, kps))
    return scenes


@pytest.mark.slow
@refine_weights
def test_cascade_does_not_hurt_and_gates_clutter(cascade_scenes):
    """The refined cascade must (a) keep SCRFD-level recall/landmark bars
    and (b) not degrade mean box IoU vs the proposal-only detector — the
    cascade's purpose is tighter boxes, MTCNN R-Net semantics."""
    from deepfake_vit_tpu.preprocessing.detector import FaceDetector

    base = FaceDetector(confidence_threshold=0.3, input_size=(SIZE, SIZE))
    casc = FaceDetector(
        confidence_threshold=0.3, input_size=(SIZE, SIZE), refine=True,
        refine_threshold=0.5,
    )
    images = np.stack([s[0] for s in cascade_scenes]).astype(np.float32)
    out_b = base.detect_batch_raw(images)
    out_c = casc.detect_batch_raw(images)

    def best_ious(out):
        ious, lm_errs, hits = [], [], 0
        for i, (_, boxes, kps) in enumerate(cascade_scenes):
            valid = out["valid"][i]
            if not valid.any():
                ious.append(0.0)
                continue
            scores = out["scores"][i][valid]
            best = int(np.argmax(scores))
            bbox = out["boxes"][i][valid][best]
            lms = out["landmarks"][i][valid][best]
            iou = max(_iou_np(bbox, b) for b in boxes)
            ious.append(iou)
            if iou > 0.5:
                hits += 1
                ied = float(np.linalg.norm(kps[0][0] - kps[0][1]))
                lm_errs.append(
                    float(np.linalg.norm(lms - kps[0], axis=1).mean()) / ied
                )
        return np.array(ious), np.array(lm_errs), hits

    iou_b, _, _ = best_ious(out_b)
    iou_c, lm_c, hits_c = best_ious(out_c)

    n = len(cascade_scenes)
    assert hits_c / n >= 0.9, f"cascade recall {hits_c}/{n}"
    assert lm_c.mean() < 0.10, f"cascade landmark err {lm_c.mean():.3f} IED"
    assert iou_c.mean() >= iou_b.mean() - 0.01, (
        f"cascade degraded box IoU: {iou_b.mean():.3f} → {iou_c.mean():.3f}"
    )


@pytest.mark.slow
@refine_weights
def test_cascade_clutter_suppression():
    """The stage-2 gate must keep (or improve) the clutter false-positive
    bar: crops of non-face proposals re-score below the gate."""
    from deepfake_vit_tpu.data.synth_faces import render_scene
    from deepfake_vit_tpu.preprocessing.detector import FaceDetector

    det = FaceDetector(
        confidence_threshold=0.3, input_size=(SIZE, SIZE), refine=True,
        refine_threshold=0.5,
    )
    rng = np.random.default_rng(HELDOUT_SEED + 22)
    images = np.stack(
        [render_scene(rng, size=SIZE, p_empty=1.1)[0] for _ in range(16)]
    )
    out = det.detect_batch_raw(images.astype(np.float32))
    max_scores = np.where(out["valid"], out["scores"], 0.0).max(axis=1)
    assert (max_scores < 0.6).mean() >= 0.9, f"clutter scores: {max_scores}"
