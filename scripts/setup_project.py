#!/usr/bin/env python
"""Project scaffolding CLI (reference ``scripts/setup_project.py:11-281``):
creates the data/checkpoint/output directory skeleton and README stubs."""

import argparse
from pathlib import Path

DIRS = [
    "data/raw",
    "data/processed/faces",
    "data/processed/landmarks",
    "data/processed/metadata",
    "data/processed/splits",
    "checkpoints",
    "runs",
    "outputs/logs",
    "outputs/visualizations",
]

READMES = {
    "data/raw": "Place raw datasets here: LFW-FER/, DeeperForensics/, GenAI/ "
    "(see deepfake_vit_tpu/configs/preprocessing_config.yaml 'datasets').",
    "data/processed": "Written by scripts/preprocess_dataset.py: faces/ (aligned "
    "PNGs), landmarks/ (NPY), metadata/ (JSON), splits/ (train/val/test CSVs), "
    "preprocessing_results.csv, preprocessing_statistics.json.",
    "checkpoints": "Rotating training checkpoints + best_model.ckpt.",
    "runs": "Training logs.",
    "outputs": "Evaluation metrics, predictions, visualizations.",
}

GITIGNORE = """\
data/
checkpoints/
runs/
outputs/
*.ckpt
__pycache__/
"""


def main():
    parser = argparse.ArgumentParser(description="Create project directory skeleton")
    parser.add_argument("--root", type=str, default=".")
    args = parser.parse_args()

    root = Path(args.root)
    for d in DIRS:
        (root / d).mkdir(parents=True, exist_ok=True)
        print(f"created {root / d}")
    for d, text in READMES.items():
        readme = root / d / "README.md"
        if not readme.exists():
            readme.write_text(text + "\n")
    gi = root / ".gitignore"
    if not gi.exists():
        gi.write_text(GITIGNORE)
    print("project skeleton ready")


if __name__ == "__main__":
    main()
