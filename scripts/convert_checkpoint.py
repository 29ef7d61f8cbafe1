#!/usr/bin/env python
"""Convert torch checkpoints to framework .ckpt files.

Closes the reference's pretrained-weight workflows for the JAX stack:

- ``--kind backbone``: efficientnet-pytorch ImageNet ``.pth``
  (``efficientnet.py:42-59``'s ``efficientnet-b4-6ed6700e.pth``) → backbone
  params usable via ``--init-from`` in training.
- ``--kind model``: a full trained reference ``DeepfakeDetectionModel``
  checkpoint (as saved by the reference Trainer) → a framework ``.ckpt``
  loadable by evaluate.py / predict.py / run_pipeline.py — the AUC-parity
  path (BASELINE.md target: FF++ AUC within 0.5 pts).
- ``--kind vit``: HuggingFace ViTForImageClassification directory/state
  dict → ViTClassifier params.
- ``--kind detector``: an external SCRFD-style detector ``.pth``
  (layout spec: ``models/convert.py::convert_scrfd_detector``) → a flax
  msgpack loadable by ``FaceDetector.load_weights`` / promotable via
  ``scripts/promote_weights.py --model scrfd`` — the real-weights path of
  the reference's buffalo_l download (``face_detector.py:220-227``).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser(description="torch → JAX checkpoint conversion")
    parser.add_argument("--input", type=str, required=True, help=".pth / HF dir")
    parser.add_argument("--output", type=str, required=True, help="output .ckpt path")
    parser.add_argument("--kind", choices=["backbone", "model", "vit", "detector"],
                        default="model")
    parser.add_argument("--variant", type=str, default="b4")
    parser.add_argument("--hidden-dims", type=int, nargs="+", default=[512, 128, 32])
    args = parser.parse_args()

    from deepfake_vit_tpu.models.convert import (
        convert_detection_model,
        convert_efficientnet_backbone,
        load_torch_state_dict,
    )
    from deepfake_vit_tpu.utils import save_checkpoint, setup_logger

    logger = setup_logger("convert")

    if args.kind == "vit":
        from deepfake_vit_tpu.models.vit import convert_hf_vit

        input_path = Path(args.input)
        if input_path.is_dir():
            import transformers

            hf = transformers.ViTForImageClassification.from_pretrained(str(input_path))
            sd = hf.state_dict()
        else:
            sd = load_torch_state_dict(args.input)
        variables = convert_hf_vit(sd, variant=args.variant if args.variant in
                                   ("tiny16", "small16", "base16") else "base16")
        state = {"epoch": 0, "params": variables["params"], "batch_stats": {},
                 "opt_state": {}, "source": str(args.input)}
    elif args.kind == "detector":
        from flax import serialization

        from deepfake_vit_tpu.models.convert import convert_scrfd_detector

        sd = load_torch_state_dict(args.input)
        variables = convert_scrfd_detector(sd)
        out = Path(args.output)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "wb") as f:
            f.write(serialization.msgpack_serialize(
                serialization.to_state_dict(variables)))
        logger.info(f"converted detector checkpoint → {out}")
        return
    else:
        sd = load_torch_state_dict(args.input)
        if args.kind == "backbone":
            params, stats = convert_efficientnet_backbone(sd, args.variant)
            state = {"epoch": 0, "params": {"backbone": params},
                     "batch_stats": {"backbone": stats}, "opt_state": {},
                     "source": str(args.input)}
        else:
            variables = convert_detection_model(
                sd, variant=args.variant, hidden_dims=tuple(args.hidden_dims)
            )
            state = {"epoch": 0, "params": variables["params"],
                     "batch_stats": variables["batch_stats"], "opt_state": {},
                     "source": str(args.input)}

    out = Path(args.output)
    path = save_checkpoint(state, out.parent, filename=out.name, max_keep=0)
    logger.info(f"converted {args.kind} checkpoint → {path}")


if __name__ == "__main__":
    main()
