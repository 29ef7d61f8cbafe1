#!/usr/bin/env python
"""Evaluation CLI.

Capability parity with reference ``scripts/evaluate.py:23-146``: load a
checkpoint + config, evaluate on the test split with full metrics, and
``--detailed`` per-class accuracy and accuracy/coverage at confidence
thresholds 0.5/0.7/0.9.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Evaluate a trained model (TPU)")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--split", type=str, default="test", choices=["train", "val", "test"])
    parser.add_argument("--processed-dir", type=str, default=None)
    parser.add_argument("--output-dir", type=str, default="outputs")
    parser.add_argument("--detailed", action="store_true")
    parser.add_argument(
        "--visualize", action="store_true",
        help="save a prediction grid of the first batch (outputs/eval_grid.png)",
    )
    args = parser.parse_args()

    from deepfake_vit_tpu.data import create_dataloaders
    from deepfake_vit_tpu.models import create_model_from_config
    from deepfake_vit_tpu.parallel import make_mesh
    from deepfake_vit_tpu.training import (
        Evaluator,
        TrainState,
        create_optimizer,
        make_criterion,
        restore_train_state,
    )
    from deepfake_vit_tpu.utils import load_checkpoint, load_config, save_metrics, setup_logger

    config_path = args.config or str(
        Path(__file__).resolve().parents[1] / "deepfake_vit_tpu" / "configs" / "model_config.yaml"
    )
    config = load_config(config_path)

    from deepfake_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    logger = setup_logger("evaluate")

    mesh = make_mesh(tuple(config.get("hardware", {}).get("mesh_axes") or ("data",)))

    data_cfg = config.get("data", {})
    processed_dir = args.processed_dir or data_cfg.get("processed_dir", "data/processed")
    loaders = create_dataloaders(
        processed_dir,
        batch_size=args.batch_size or data_cfg.get("batch_size", 64),
        num_workers=data_cfg.get("num_workers", 4),
        use_landmarks=data_cfg.get("use_landmarks", True),
        mesh=mesh,
        splits=(args.split,),
        image_size=data_cfg.get("image_size", 224),
        cache=data_cfg.get("cache"),
    )
    loader = loaders[args.split]

    train_cfg = config.get("training", {})
    dtype = jnp.bfloat16 if train_cfg.get("use_amp", True) else jnp.float32
    model = create_model_from_config(config.get("model", {}), dtype=dtype)
    criterion = make_criterion(train_cfg.get("loss", {}))

    sample = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng}, sample["image"], sample.get("landmarks"), train=False
    )
    optimizer = create_optimizer(train_cfg.get("optimizer", {}))
    template = TrainState.create(
        variables["params"], variables["batch_stats"], optimizer.init(variables["params"])
    )
    ckpt = load_checkpoint(args.checkpoint)
    # Eval only needs params/batch_stats; the optimizer chain that produced
    # the checkpoint may differ (e.g. gradient clipping), so skip opt_state.
    state = restore_train_state(template, ckpt, restore_opt=False)
    logger.info(f"loaded checkpoint {args.checkpoint} (epoch {ckpt.get('epoch')})")

    evaluator = Evaluator(model, criterion, data_cfg.get("use_landmarks", True), mesh)
    metrics = evaluator.evaluate(state, loader, return_predictions=True)
    evaluator.print_metrics(metrics, logger, title=f"{args.split} evaluation")

    preds = metrics.pop("predictions")
    probs = metrics.pop("probabilities")
    labels = metrics.pop("labels")

    if args.detailed:
        logger.info("--- detailed ---")
        for cls, name in ((0, "real"), (1, "fake")):
            mask = labels == cls
            if mask.sum():
                acc = float((preds[mask] == cls).mean())
                logger.info(f"  class {name}: accuracy {acc:.4f} (n={int(mask.sum())})")
        conf = probs.max(axis=1)
        for th in (0.5, 0.7, 0.9):
            mask = conf >= th
            cov = float(mask.mean())
            acc = float((preds[mask] == labels[mask]).mean()) if mask.sum() else float("nan")
            logger.info(f"  conf ≥ {th}: accuracy {acc:.4f} coverage {cov:.4f}")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.visualize:
        from deepfake_vit_tpu.utils import visualize_batch

        first = next(iter(loader))
        n = min(len(preds), 16)
        visualize_batch(
            np.asarray(first["image"])[:n],
            labels=labels[:n],
            predictions=preds[:n],
            save_path=out_dir / f"eval_grid_{args.split}.png",
        )
        logger.info(f"wrote {out_dir}/eval_grid_{args.split}.png")
    save_metrics(
        {k: v for k, v in metrics.items() if isinstance(v, (int, float, list))},
        out_dir / f"eval_{args.split}.json",
    )
    np.savez(
        out_dir / f"predictions_{args.split}.npz", preds=preds, probs=probs, labels=labels
    )
    logger.info(f"wrote {out_dir}/eval_{args.split}.json")


if __name__ == "__main__":
    main()
