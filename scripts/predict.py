#!/usr/bin/env python
"""Competition-style inference CLI.

Capability parity with the reference submission path (``task.ipynb`` cell
16): for each file in a directory — images use 1 frame, videos sample
``--frames`` (default 5) evenly-spaced frames via ``np.linspace`` seeks —
detect → align → classify each frame in ONE batched forward, average
fake-probability, threshold 0.5 → label 1; any failure or no-face → label
0 (real); write ``submission.csv`` (filename,label).
"""

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm"}


def sample_video_frames(path: Path, count: int):
    """Evenly-spaced frame sampling via position seeks (reference semantics)."""
    import cv2

    cap = cv2.VideoCapture(str(path))
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if total <= 0:
            return []
        indices = np.linspace(0, total - 1, min(count, total)).astype(int)
        frames = []
        for idx in indices:
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
            ok, frame = cap.read()
            if ok:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        return frames
    finally:
        cap.release()


def main():
    parser = argparse.ArgumentParser(description="Predict real/fake for files (TPU)")
    parser.add_argument("--data-dir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="trained checkpoint; when absent, the shipped "
                        "promotion-gated classifier weights are used "
                        "(deepfake_vit_tpu/weights/classifier_synface.msgpack)")
    parser.add_argument("--config", type=str, default=None, help="model config YAML")
    parser.add_argument("--preprocessing-config", type=str, default=None)
    parser.add_argument("--output", type=str, default="submission.csv")
    parser.add_argument("--frames", type=int, default=5)
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args()

    import cv2

    from deepfake_vit_tpu.inference import DeepfakePredictor
    from deepfake_vit_tpu.utils import load_config, setup_logger

    logger = setup_logger("predict")

    from deepfake_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    pkg_cfg = Path(__file__).resolve().parents[1] / "deepfake_vit_tpu" / "configs"
    model_config = load_config(args.config or pkg_cfg / "model_config.yaml")
    pre_config = load_config(args.preprocessing_config or pkg_cfg / "preprocessing_config.yaml")

    if args.checkpoint:
        predictor = DeepfakePredictor(
            model_config, pre_config, checkpoint_path=args.checkpoint,
            frame_count=args.frames, threshold=args.threshold,
        )
    else:
        # Out-of-the-box path: the shipped promotion-gated classifier
        # (reference parity: task.ipynb cell 16 loads a trained
        # best_model.pth; here the artifact is in-repo and acceptance-gated).
        from deepfake_vit_tpu.preprocessing.detector import default_weights_path

        shipped = default_weights_path("classifier")
        if not shipped:
            parser.error(
                "--checkpoint not given and no shipped classifier weights "
                "found (deepfake_vit_tpu/weights/classifier_synface.msgpack)"
            )
        logger.info(f"using shipped classifier weights: {shipped}")
        predictor = DeepfakePredictor.from_packaged(
            shipped, pre_config, frame_count=args.frames,
            threshold=args.threshold,
        )

    files = sorted(p for p in Path(args.data_dir).iterdir() if p.is_file())
    results = []
    for path in files:
        suffix = path.suffix.lower()
        label = 0
        try:
            if suffix in IMAGE_EXTS:
                bgr = cv2.imread(str(path))
                frames = [cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)] if bgr is not None else []
            elif suffix in VIDEO_EXTS:
                frames = sample_video_frames(path, args.frames)
            else:
                frames = []
            if frames:
                label = predictor.predict_frames(frames)["label"]
        except Exception as e:  # failure → real (reference semantics)
            logger.warning(f"{path.name}: {e} → label 0")
            label = 0
        results.append((path.name, label))
        logger.info(f"{path.name}: {label}")

    with open(args.output, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["filename", "label"])
        writer.writerows(results)
    logger.info(f"wrote {args.output} ({len(results)} rows)")


if __name__ == "__main__":
    main()
