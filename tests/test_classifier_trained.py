"""Acceptance bars for the shipped flagship classifier.

The promotion gate for ``weights/classifier_synface.msgpack`` — the
artifact behind ``scripts/predict.py``'s out-of-the-box default (reference
parity target: ``task.ipynb`` cell 16 loads an externally trained
``best_model.pth``; here the artifact is in-repo, reproducible from the
synthetic corpus, and may only land via ``scripts/promote_weights.py
--model classifier`` running THESE tests against the staged candidate).

Bar: held-out ROC-AUC on a FRESH-seed rendered corpus (never seen by any
training run — the train harness renders with seed 42) through the
production detect→align→classify path. The pinned threshold derives from
the measured distribution of the shipped training protocol
(BASELINE.md round-5: per-seed test AUCs of the n=8 paired runs); a
candidate below it would be a regression against what the protocol
reliably yields.
"""

import numpy as np
import pytest

from deepfake_vit_tpu.preprocessing.detector import default_weights_path

WEIGHTS = default_weights_path("classifier")

pytestmark = pytest.mark.skipif(
    WEIGHTS is None,
    reason="no classifier weights staged/shipped (promotion-gated artifact)",
)

# Held-out corpus: fresh render seed, same generator distribution the
# protocol trains on. 50/class keeps the CPU-backend run in test budget.
HELDOUT_SEED = 20260820
N_PER_CLASS = 50
# Minimum fraction of the held-out corpus the detect→align front end must
# successfully process (the trained SCRFD finds ≥99% on this distribution).
MIN_SUCCESS = 0.9
# AUC bar: see BASELINE.md round-5 classifier-promotion section for the
# derivation from the n=8 protocol AUC distribution.
AUC_BAR = 0.62


def _load_packaged():
    from deepfake_vit_tpu.utils import load_checkpoint

    packaged = load_checkpoint(WEIGHTS)
    assert packaged.get("format") == "dfv-classifier-v1"
    return packaged


def test_packaged_format_contract():
    packaged = _load_packaged()
    assert "params" in packaged and "batch_stats" in packaged
    cfg = packaged.get("model_config")
    assert cfg and "feature_extractor" in cfg
    face = int(packaged.get("face_size", 0))
    assert face in (96, 128, 160, 192, 224)


@pytest.mark.slow
def test_heldout_auc_bar():
    import jax

    from deepfake_vit_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from deepfake_vit_tpu.data.synth_faces import render_labeled_face
    from deepfake_vit_tpu.models import create_model_from_config
    from deepfake_vit_tpu.ops.metrics import roc_auc
    from deepfake_vit_tpu.preprocessing.pipeline import PreprocessingPipeline

    packaged = _load_packaged()
    face = int(packaged.get("face_size", 224))

    rng = np.random.default_rng(HELDOUT_SEED)
    images, labels = [], []
    for label in (0, 1):
        for _ in range(N_PER_CLASS):
            img, _, _ = render_labeled_face(rng, size=320, fake=bool(label))
            images.append(img)
            labels.append(label)

    pipe = PreprocessingPipeline({
        "detection": {"method": "scrfd", "confidence_threshold": 0.3,
                      "scrfd": {"input_size": [320, 320]}},
        "alignment": {"output_size": [face, face]},
        "quality": {"enabled": False},
    })
    kept_imgs, kept_lms, kept_labels = [], [], []
    B = 25
    for i in range(0, len(images), B):
        outs = pipe.process_batch(images[i:i + B])
        for out, lab in zip(outs, labels[i:i + B]):
            if out.success:
                kept_imgs.append(np.asarray(out.aligned_face, np.float32))
                kept_lms.append(np.asarray(out.landmarks, np.float32))
                kept_labels.append(lab)

    n = len(kept_labels)
    assert n >= MIN_SUCCESS * len(images), f"front end processed only {n}"

    model = create_model_from_config(packaged["model_config"])
    variables = {"params": packaged["params"],
                 "batch_stats": packaged["batch_stats"]}
    fwd = jax.jit(lambda v, i, l: model.apply(v, i, l, train=False)[0])

    probs = []
    for i in range(0, n, B):
        imgs = np.stack(kept_imgs[i:i + B])
        imgs = (np.clip(imgs, 0, 255) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        lms = np.stack(kept_lms[i:i + B])
        logits = np.asarray(fwd(variables, imgs.astype(np.float32), lms))
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs.extend((e / e.sum(-1, keepdims=True))[:, 1].tolist())

    auc = roc_auc(np.asarray(kept_labels), np.asarray(probs))
    print(f"held-out AUC: {auc:.4f} over {n} faces (bar {AUC_BAR})")
    assert auc >= AUC_BAR, f"held-out AUC {auc:.4f} below bar {AUC_BAR}"


@pytest.mark.slow
def test_out_of_the_box_predict_cli(tmp_path):
    """`scripts/predict.py` with NO --checkpoint must produce a valid
    submission.csv from the shipped promotion-gated classifier — the
    reference's task.ipynb cell-16 flow with the external best_model.pth
    replaced by the in-repo gated artifact (VERDICT r4 missing #3)."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    import cv2

    from deepfake_vit_tpu.data.synth_faces import render_labeled_face

    repo = Path(__file__).resolve().parents[1]
    data = tmp_path / "files"
    data.mkdir()
    rng = np.random.default_rng(5)
    for i, fake in enumerate([False, True]):
        img, _, _ = render_labeled_face(rng, size=320, fake=fake)
        cv2.imwrite(str(data / f"img_{i}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    (data / "corrupt.png").write_text("not media")

    out = tmp_path / "submission.csv"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=str(repo))
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts/predict.py"),
         "--data-dir", str(data), "--output", str(out)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = out.read_text().strip().splitlines()
    assert rows[0] == "filename,label"
    body = dict(r.split(",") for r in rows[1:])
    assert set(body) == {"img_0.png", "img_1.png", "corrupt.png"}
    assert body["corrupt.png"] == "0"  # failure → real (reference semantics)
    assert all(v in ("0", "1") for v in body.values())
