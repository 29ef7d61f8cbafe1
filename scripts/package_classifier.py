#!/usr/bin/env python
"""Package a trained classifier checkpoint for shipping.

Converts a ``scripts/train.py`` checkpoint (``best_model.ckpt``) into a
self-describing weights file: params + batch_stats + the model/config
subtree it was trained with, so ``scripts/predict.py`` can rebuild the
exact architecture with no side-channel YAML. The optimizer state and
tracker history are stripped (eval consumers never need them; they are
most of the checkpoint's bytes).

The output is a STAGED candidate — it ships only through
``scripts/promote_weights.py --model classifier``, whose acceptance bar is
held-out AUC on a fresh-seed rendered corpus (tests/test_classifier_trained.py).
This mirrors the reference inference flow's external ``best_model.pth``
(``task.ipynb`` cell 16) while making the artifact reproducible and gated.

Usage:
    python scripts/package_classifier.py \
        --checkpoint outputs/ab_w96/ckpt_w128_s42/best_model.ckpt \
        --config outputs/ab_w96/model_w128_s42.yaml \
        --out checkpoints/staging/classifier.msgpack
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", required=True,
                        help="the model_config YAML the checkpoint was trained with")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    from flax import serialization

    from deepfake_vit_tpu.utils import load_checkpoint, load_config

    ckpt = load_checkpoint(args.checkpoint)
    config = load_config(args.config)
    face_size = int(config.get("data", {}).get("image_size", 224))
    packaged = {
        "format": "dfv-classifier-v1",
        "params": ckpt["params"],
        "batch_stats": ckpt.get("batch_stats", {}),
        "epoch": ckpt.get("epoch", -1),
        "model_config": config.get("model", {}),
        "face_size": face_size,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.msgpack_serialize(packaged))
    import numpy as np

    n_params = sum(
        int(np.prod(np.shape(x)))
        for x in __import__("jax").tree_util.tree_leaves(ckpt["params"])
    )
    print(f"packaged {n_params:,}-param "
          f"{config.get('model', {}).get('feature_extractor', {}).get('variant')}"
          f" classifier (face {face_size}², epoch {packaged['epoch']}) → {out} "
          f"({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
