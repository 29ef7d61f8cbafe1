"""Host-RSS growth diagnostic for long training loops.

Runs N epochs of the real Trainer on a processed dataset and logs RSS per
epoch under one of three per-epoch actions, to attribute the growth:

    none   — baseline (what production runs do)
    gc     — gc.collect() each epoch (tests the Python-garbage hypothesis)
    clear  — jax.clear_caches() + gc.collect() (tests the jit-cache
             hypothesis — NOTE: forces a full recompile every epoch)

Round-3 measured verdict on this image (8 epochs, b0, CPU backend,
identical per-epoch losses across arms):

    none:   ~15 MB/epoch steady growth
    gc:     ~19 MB/epoch (no effect — the growth is not Python garbage)
    clear:  ~118 MB/epoch (7× WORSE — every clear/recompile cycle leaves
            ~100 MB of untracked native allocations; do NOT use periodic
            clear_caches as a leak mitigation)

The residual growth is native-allocator retention below the Python layer;
the production mitigation remains periodic checkpointing + --resume
(both default-wired in scripts/train.py). The reference's 100-epoch
default (`/root/reference/src/training/trainer.py:59-70`) has the same
exposure through torch's allocator.

Usage:
    python scripts/diag_rss.py --processed-dir data/processed \
        --epochs 8 --action none --batch-size 8
"""

import argparse
import gc
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--processed-dir", required=True)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--action", choices=("none", "gc", "clear"), default="none")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--variant", default="b0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepfake_vit_tpu.data import create_dataloaders
    from deepfake_vit_tpu.models import create_model_from_config
    from deepfake_vit_tpu.parallel import data_parallel_mesh
    from deepfake_vit_tpu.training import (
        TrainState, Trainer, create_optimizer, make_criterion,
    )
    from deepfake_vit_tpu.training.trainer import _rss_mb

    mesh = data_parallel_mesh()
    loaders = create_dataloaders(
        args.processed_dir, batch_size=args.batch_size, num_workers=2, mesh=mesh
    )
    rng = jax.random.PRNGKey(0)
    model = create_model_from_config(
        {"feature_extractor": {"variant": args.variant},
         "classifier": {"hidden_dims": [32]}},
        dtype=jnp.bfloat16,
    )
    opt = create_optimizer({"type": "AdamW", "lr": 1e-4}, gradient_clip=1.0)
    crit = make_criterion({"type": "CombinedLoss"})
    sample = next(iter(loaders["train"]))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample["image"], sample.get("landmarks"), train=False,
    )
    state = TrainState.create(
        variables["params"], variables["batch_stats"], opt.init(variables["params"])
    )
    trainer = Trainer(
        model, state, opt, crit,
        train_loader=loaders["train"],
        val_loader=loaders.get("val", loaders["train"]),
        scheduler=None,
        config={
            "num_epochs": args.epochs, "gradient_clip": 1.0,
            "accumulation_steps": 1, "use_amp": True, "remat": False,
            "early_stopping_patience": 10**9, "early_stopping_min_delta": 0.0,
            "save_freq": 10**9, "print_freq": 10**9,
            "save_dir": "/tmp/diag_rss_ckpt", "max_keep": 1,
            "save_best_only": True, "tb_dir": None,
        },
        rng=rng,
        mesh=mesh,
    )

    print(f"action={args.action} rss0={_rss_mb():.0f}MB", flush=True)
    for epoch in range(args.epochs):
        tm = trainer.train_epoch(epoch)
        trainer.validate(epoch)
        if args.action == "gc":
            gc.collect()
        elif args.action == "clear":
            jax.clear_caches()
            gc.collect()
        print(f"epoch {epoch}: rss={_rss_mb():.0f}MB loss={tm['loss']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
