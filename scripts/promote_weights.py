#!/usr/bin/env python
"""Promote staged detector weights into the shipped weights dir — gated.

The ONLY sanctioned way a trained-weights file lands in
``deepfake_vit_tpu/weights/``. It runs the candidate through the family's
acceptance tests (tests/test_detector_trained.py / test_hog_detector.py) by
pointing ``DFV_WEIGHTS_<MODEL>`` at the staged file, and copies it into the
shipped path ATOMICALLY only when every bar passes. ``scripts/
train_detector.py`` refuses to --save into the shipped dir, so together the
two make "file presence in weights/ == acceptance" mechanically true — the
invariant bench.py's gated sweep candidates (e.g. ``+L``) rely on.

Mirrors the trust contract of the reference's pretrained-detector download
(``src/preprocessing/face_detector.py:220-227``): a detector the pipeline
auto-loads must already be known-good.

Usage:
    python scripts/promote_weights.py checkpoints/staging/lite.msgpack --model lite
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Family → (acceptance test node selection, shipped filename). Node ids are
# explicit so the scrfd selection can never silently match the s2d-lite
# tests that share its bar names.
FAMILY_TESTS = {
    "scrfd": (
        [
            "tests/test_detector_trained.py::test_recall_and_landmark_accuracy",
            "tests/test_detector_trained.py::test_no_high_confidence_false_positives",
            "tests/test_detector_trained.py::test_single_image_contract",
        ],
        "scrfd_synface.msgpack",
    ),
    "mtcnn": (
        ["tests/test_detector_trained.py::test_mtcnn_lite_trained_quality"],
        "mtcnn_lite_synface.msgpack",
    ),
    "lite": (
        [
            "tests/test_detector_trained.py::test_s2d_lite_recall_and_landmark_accuracy",
            "tests/test_detector_trained.py::test_s2d_lite_no_high_confidence_false_positives",
        ],
        "lite_synface.msgpack",
    ),
    "hog": (
        [
            "tests/test_hog_detector.py::test_trained_template_acceptance",
            "tests/test_hog_detector.py::test_trained_template_clutter_bar",
        ],
        "hog_synface.msgpack",
    ),
    "refine": (
        [
            "tests/test_refine_net.py::test_cascade_does_not_hurt_and_gates_clutter",
            "tests/test_refine_net.py::test_cascade_clutter_suppression",
        ],
        "refine_synface.msgpack",
    ),
    # End-task classifier (not a detector): held-out AUC on a FRESH-seed
    # rendered corpus through the production detect→align→classify path —
    # the gate behind scripts/predict.py's out-of-the-box default.
    "classifier": (
        [
            "tests/test_classifier_trained.py::test_heldout_auc_bar",
            "tests/test_classifier_trained.py::test_packaged_format_contract",
        ],
        "classifier_synface.msgpack",
    ),
}


def run_acceptance(candidate: Path, model: str) -> bool:
    """Run the family's acceptance bars against the CANDIDATE file."""
    nodes, _ = FAMILY_TESTS[model]
    env = dict(os.environ)
    env[f"DFV_WEIGHTS_{model.upper()}"] = str(candidate)
    env["PYTHONPATH"] = str(REPO)
    # Acceptance runs on the CPU backend: deterministic, and never touches
    # (or blocks on) the TPU tunnel. PALLAS_AXON_POOL_IPS must be absent or
    # the sitecustomize register() can hang backend init when the tunnel is
    # wedged (CLAUDE.md round-3 lesson).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *nodes],
        cwd=REPO, env=env,
    )
    return proc.returncode == 0


def promote(candidate: Path, model: str) -> Path:
    """Atomically copy an accepted candidate into the shipped dir."""
    _, shipped_name = FAMILY_TESTS[model]
    dest = REPO / "deepfake_vit_tpu" / "weights" / shipped_name
    dest.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dest.parent, suffix=".tmp")
    os.close(fd)
    shutil.copyfile(candidate, tmp)
    os.replace(tmp, dest)
    return dest


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("candidate", type=str, help="staged msgpack weights")
    parser.add_argument("--model", required=True, choices=sorted(FAMILY_TESTS))
    args = parser.parse_args()

    candidate = Path(args.candidate).resolve()
    if not candidate.exists():
        parser.error(f"candidate not found: {candidate}")

    print(f"[promote] acceptance run: model={args.model} candidate={candidate}")
    if not run_acceptance(candidate, args.model):
        print(f"[promote] REFUSED — acceptance bars failed; "
              f"{candidate} stays staged", file=sys.stderr)
        return 1
    dest = promote(candidate, args.model)
    print(f"[promote] accepted → {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
