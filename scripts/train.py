#!/usr/bin/env python
"""Training CLI.

Capability parity with reference ``scripts/train.py:26-274``: seeded
end-to-end training from a model_config.yaml — dataloaders, class weights,
model from config, optimizer/scheduler/criterion factories, optional
``--resume``, early stopping, checkpointing, final test-set evaluation.

TPU-native: builds a named device mesh from the config's hardware block and
jits the train step over it; bf16 activations when ``use_amp``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def set_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    import random

    random.seed(seed)
    return jax.random.PRNGKey(seed)


def main():
    parser = argparse.ArgumentParser(description="Train the deepfake detection model (TPU)")
    parser.add_argument("--config", type=str, default=None, help="model config YAML")
    parser.add_argument("--resume", type=str, default=None, help="checkpoint to resume from")
    parser.add_argument("--processed-dir", type=str, default=None, help="override data dir")
    parser.add_argument("--epochs", type=int, default=None, help="override num_epochs")
    parser.add_argument("--batch-size", type=int, default=None, help="override global batch size")
    args = parser.parse_args()

    from deepfake_vit_tpu.data import create_dataloaders
    from deepfake_vit_tpu.models import create_model_from_config
    from deepfake_vit_tpu.parallel import make_mesh
    from deepfake_vit_tpu.training import (
        TrainState,
        Trainer,
        create_optimizer,
        create_scheduler,
        make_criterion,
    )
    from deepfake_vit_tpu.utils import load_config, setup_logger

    config_path = args.config or str(
        Path(__file__).resolve().parents[1] / "deepfake_vit_tpu" / "configs" / "model_config.yaml"
    )
    config = load_config(config_path)

    # Multi-process bootstrap BEFORE any backend initialization: no-op
    # unless DFV_COORDINATOR/DFV_NUM_PROCESSES/DFV_PROCESS_ID (or TPU-pod
    # auto-detection inputs) are present.
    from deepfake_vit_tpu.parallel import maybe_initialize_distributed

    distributed = maybe_initialize_distributed()

    from deepfake_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    logger = setup_logger("train", Path(config.get("logging", {}).get("log_dir", "runs")) / "train.log")
    if distributed:
        logger.info(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local of {jax.device_count()} devices"
        )

    seed = int(config.get("seed", 42))
    rng = set_seed(seed)

    hw = config.get("hardware", {})
    axes = tuple(hw.get("mesh_axes") or ("data",))
    mesh = make_mesh(axes, hw.get("mesh_shape"))
    logger.info(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} on {jax.devices()[0].platform}")

    data_cfg = config.get("data", {})
    processed_dir = args.processed_dir or data_cfg.get("processed_dir", "data/processed")
    batch_size = args.batch_size or data_cfg.get("batch_size", 64)
    loaders = create_dataloaders(
        processed_dir,
        batch_size=batch_size,
        num_workers=data_cfg.get("num_workers", 4),
        use_landmarks=data_cfg.get("use_landmarks", True),
        mesh=mesh,
        seed=seed,
        image_size=data_cfg.get("image_size", 224),
        cache=data_cfg.get("cache"),
    )
    if "train" not in loaders:
        logger.error(f"no train split found under {processed_dir}/splits — run preprocess_dataset.py first")
        sys.exit(1)

    class_weights = loaders["train"].dataset.get_class_weights()
    logger.info(f"class weights: {class_weights.tolist()}")

    train_cfg = config.get("training", {})
    dtype = jnp.bfloat16 if train_cfg.get("use_amp", True) else jnp.float32
    model = create_model_from_config(config.get("model", {}), dtype=dtype)

    optimizer = create_optimizer(
        train_cfg.get("optimizer", {}), gradient_clip=train_cfg.get("gradient_clip")
    )
    scheduler = create_scheduler(
        train_cfg.get("scheduler"), float(train_cfg.get("optimizer", {}).get("lr", 1e-4))
    )
    criterion = make_criterion(train_cfg.get("loss", {}), jnp.asarray(class_weights))

    # Init params on host then let the step's shardings place them.
    sample = next(iter(loaders["train"]))
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = jax.jit(model.init, static_argnames=("train",))(
        init_rngs, sample["image"], sample.get("landmarks"), train=False
    )
    opt_state = optimizer.init(variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], opt_state)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"model params: {n_params:,}")

    from deepfake_vit_tpu.ops.augment import make_augment_fn

    augment_fn = make_augment_fn(data_cfg.get("augmentation"))
    if augment_fn is not None:
        logger.info("on-device augmentation enabled")

    trainer = Trainer(
        model,
        state,
        optimizer,
        criterion,
        train_loader=loaders["train"],
        val_loader=loaders.get("val", loaders["train"]),
        scheduler=scheduler,
        augment_fn=augment_fn,
        config={
            "num_epochs": args.epochs or train_cfg.get("num_epochs", 100),
            "gradient_clip": train_cfg.get("gradient_clip", 1.0),
            "accumulation_steps": train_cfg.get("accumulation_steps", 1),
            "use_amp": train_cfg.get("use_amp", True),
            "remat": train_cfg.get("remat", False),
            "early_stopping_patience": config.get("early_stopping", {}).get("patience", 15),
            "early_stopping_min_delta": config.get("early_stopping", {}).get("min_delta", 1e-3),
            "save_freq": config.get("validation", {}).get("save_freq", 5),
            "print_freq": config.get("validation", {}).get("print_freq", 10),
            "save_dir": config.get("checkpoint", {}).get("save_dir", "checkpoints"),
            "max_keep": config.get("checkpoint", {}).get("max_keep", 5),
            "save_best_only": config.get("checkpoint", {}).get("save_best_only", False),
            "tb_dir": str(
                Path(config.get("logging", {}).get("log_dir", "runs")) / "tb"
            ),
        },
        use_landmarks=data_cfg.get("use_landmarks", True),
        mesh=mesh,
        rng=rng,
        logger=logger,
    )

    start_epoch = 0
    if args.resume:
        start_epoch = trainer.resume_from_checkpoint(args.resume)

    trainer.train(start_epoch)

    if "test" in loaders:
        logger.info("final test evaluation")
        test_metrics = trainer.evaluator.evaluate(trainer.state, loaders["test"])
        trainer.evaluator.print_metrics(test_metrics, logger, title="Test")


if __name__ == "__main__":
    main()
