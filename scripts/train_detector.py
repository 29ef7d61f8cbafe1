#!/usr/bin/env python
"""Face-detector training CLI.

A capability the reference lacks entirely (it consumes pretrained ONNX
weights): trains the SCRFD-class detection net in-framework so the
detection path needs no external weight conversion.

Annotations: a JSON file — list of records
``{"image": path, "boxes": [[x1,y1,x2,y2], ...],
   "landmarks": [[[x,y]×5], ...]}`` in original-image pixels (landmarks
optional; boxes required). Images are letterboxed to ``--input-size`` with
coordinates scaled accordingly; ground truths pad to ``--max-faces`` with a
validity mask (static shapes).

Output: ``--save`` msgpack state dict loadable by
``FaceDetector.load_weights`` and ``FusedPipeline.load_variables``.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def shipped_weights_dir() -> Path:
    """The committed-weights dir guarded by the promotion gate."""
    return Path(__file__).resolve().parents[1] / "deepfake_vit_tpu" / "weights"


def save_targets_shipped_dir(save_path: str) -> bool:
    """True if --save would write inside deepfake_vit_tpu/weights/.

    Training must never write there directly: round 3 shipped a mid-train
    checkpoint because --save-every wrote per-epoch snapshots straight to
    the committed path, silently voiding the 'presence == acceptance'
    invariant (VERDICT r3 weak #1). Promotion goes through
    scripts/promote_weights.py only.
    """
    try:
        resolved = Path(save_path).resolve()
    except OSError:
        return False
    shipped = shipped_weights_dir()
    return resolved == shipped or shipped in resolved.parents


def load_annotations(path: str):
    with open(path) as f:
        return json.load(f)


def make_batch(records, indices, input_size: int, max_faces: int,
               domain_aug: float = 0.0, aug_rng=None):
    import cv2

    B = len(indices)
    images = np.zeros((B, input_size, input_size, 3), np.float32)
    boxes = np.zeros((B, max_faces, 4), np.float32)
    kps = np.zeros((B, max_faces, 5, 2), np.float32)
    valid = np.zeros((B, max_faces), np.float32)
    for i, idx in enumerate(indices):
        rec = records[int(idx)]
        bgr = cv2.imread(rec["image"])
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if domain_aug and aug_rng is not None and aug_rng.uniform() < domain_aug:
            # Photometric domain-shift augmentation (geometry untouched, so
            # boxes/landmarks stay exact). Closes the measured holes of the
            # shifted-domain suite (BASELINE.md round-4 table) by exposing
            # training to the statistics the base renderer never emits.
            from deepfake_vit_tpu.data.domain_shift import SHIFTS

            from deepfake_vit_tpu.data.domain_shift import augment_clutter

            choices = list(SHIFTS) + ["clutter"]
            shift = choices[int(aug_rng.integers(len(choices)))]
            if shift == "clutter":
                gt = np.asarray(rec.get("boxes", []), np.float32).reshape(-1, 4)
                rgb = augment_clutter(rgb, gt, aug_rng)
            else:
                rgb = SHIFTS[shift](rgb, aug_rng)
        h, w = rgb.shape[:2]
        scale = min(input_size / w, input_size / h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        images[i, :nh, :nw] = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        for g, box in enumerate(rec.get("boxes", [])[:max_faces]):
            boxes[i, g] = np.asarray(box, np.float32) * scale
            lms = rec.get("landmarks")
            if lms and g < len(lms):
                kps[i, g] = np.asarray(lms[g], np.float32) * scale
            valid[i, g] = 1.0
    return {"image": images, "boxes": boxes, "kps": kps, "valid": valid}


def main():
    parser = argparse.ArgumentParser(description="Train the SCRFD face detector (TPU)")
    parser.add_argument("--annotations", type=str, default=None, help="JSON annotation file")
    parser.add_argument(
        "--synthetic", type=int, default=0,
        help="render N procedural face scenes (data/synth_faces.py) and train on them "
        "instead of --annotations",
    )
    parser.add_argument("--synthetic-dir", type=str, default="data/synth_faces")
    parser.add_argument("--save", type=str, default="checkpoints/detector.msgpack")
    parser.add_argument("--input-size", type=int, default=320)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--model", type=str, default="scrfd",
                        choices=("scrfd", "mtcnn", "hog", "lite", "refine"),
                        help="detector family: scrfd (production), mtcnn (lite "
                        "second family), lite (S2D-Lite, the TPU-first "
                        "ultra-light net — models/lite_detector.py), hog "
                        "(the dlib-fallback linear template — trained by SVM "
                        "fitting with hard-negative mining, not SGD epochs), "
                        "or refine (the cascade stage-2 crop refiner, "
                        "models/refine_net.py — MTCNN R/O-Net analog)")
    parser.add_argument("--resume", type=str, default=None,
                        help="msgpack weights to continue from (crash recovery / "
                        "fine-tuning; parallels train.py --resume)")
    parser.add_argument("--max-faces", type=int, default=8)
    parser.add_argument("--save-every", type=int, default=10,
                        help="also write --save every N epochs (crash safety)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--kps-weight", type=float, default=2.0,
                        help="refine model only: landmark-loss weight in the "
                        "refiner objective (training/refinement.py). The kps "
                        "head is the acceptance-bar limiter (<10%% IED), so "
                        "fine-tune runs typically raise this")
    parser.add_argument("--domain-aug", type=float, default=0.0,
                        help="probability of applying a photometric domain-"
                        "shift or safe-clutter augmentation per image "
                        "(data/domain_shift.py; geometry/labels unchanged)")
    args = parser.parse_args()
    if not args.annotations and not args.synthetic:
        parser.error("one of --annotations or --synthetic is required")
    if save_targets_shipped_dir(args.save):
        parser.error(
            f"--save must not target the shipped weights dir "
            f"({shipped_weights_dir()}): per-epoch checkpoints there would "
            f"make file presence mean 'epoch 1 finished', not 'accepted'. "
            f"Train to a staging path (e.g. checkpoints/staging/…) and run "
            f"scripts/promote_weights.py, which promotes only after the "
            f"family's acceptance tests pass."
        )

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from deepfake_vit_tpu.parallel import data_parallel_mesh, shard_batch
    from deepfake_vit_tpu.preprocessing.detector import build_detection_net
    from deepfake_vit_tpu.training import create_optimizer
    from deepfake_vit_tpu.training.detection import make_detector_train_step
    from deepfake_vit_tpu.utils import enable_compilation_cache, setup_logger

    enable_compilation_cache()
    logger = setup_logger("train_detector")

    if args.model == "hog":
        # The HOG family is a single linear template: a closed training
        # recipe (positive/negative window harvesting + SVM + mining) on
        # freshly rendered scenes, not the anchor-head SGD loop below.
        from deepfake_vit_tpu.models.hog_detector import HogFaceDetector, fit_hog_template

        n = args.synthetic or 400
        logger.info(f"fitting HOG template on {n} rendered scenes")
        params = fit_hog_template(
            n_scenes=n, scene_size=args.input_size, seed=args.seed,
            log=logger.info,
        )
        det = HogFaceDetector(
            input_size=(args.input_size, args.input_size), params=params
        )
        Path(args.save).parent.mkdir(parents=True, exist_ok=True)
        det.save_weights(args.save)
        logger.info(f"saved HOG template → {args.save}")
        return

    if args.synthetic:
        from deepfake_vit_tpu.data.synth_faces import write_corpus

        ann_path = Path(args.synthetic_dir) / "annotations.json"
        existing = []
        if ann_path.exists():
            existing = load_annotations(ann_path)
        if len(existing) >= args.synthetic:
            logger.info(f"reusing {len(existing)} rendered scenes in {args.synthetic_dir}")
        else:
            logger.info(f"rendering {args.synthetic} scenes → {args.synthetic_dir}")
            write_corpus(args.synthetic_dir, args.synthetic, size=args.input_size,
                         seed=args.seed, max_faces=args.max_faces)
        args.annotations = str(ann_path)

    records = load_annotations(args.annotations)
    logger.info(f"{len(records)} annotated images")
    size = (args.input_size, args.input_size)

    if args.model == "refine":
        # Cascade stage-2: trains on sampled crop slates, not anchor maps.
        from deepfake_vit_tpu.models.refine_net import REFINE_CROP, RefineNet
        from deepfake_vit_tpu.training.refinement import (
            make_refiner_train_step, sample_refine_targets)

        model = RefineNet()
        init_shape = (1, REFINE_CROP, REFINE_CROP, 3)
    else:
        model = build_detection_net(args.model)
        init_shape = (1, *size, 3)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(args.seed), jnp.zeros(init_shape, jnp.float32)
        )
    if args.resume:
        with open(args.resume, "rb") as f:
            state = serialization.msgpack_restore(f.read())
        variables = serialization.from_state_dict(variables, state)
        logger.info(f"resumed detector weights from {args.resume}")
    optimizer = create_optimizer({"type": "AdamW", "lr": args.lr}, gradient_clip=5.0)
    with jax.default_device(cpu):
        opt_state = optimizer.init(variables["params"])

    dev = jax.devices()[0]
    params = jax.device_put(variables["params"], dev)
    stats = jax.device_put(variables["batch_stats"], dev)
    opt_state = jax.device_put(opt_state, dev)

    mesh = data_parallel_mesh()
    if args.model == "refine":
        step = make_refiner_train_step(model, optimizer, mesh=mesh,
                                       kps_weight=args.kps_weight)
    else:
        step = make_detector_train_step(model, optimizer, size, mesh)

    out = Path(args.save)
    out.parent.mkdir(parents=True, exist_ok=True)

    def save():
        state_dict = serialization.to_state_dict(
            {"params": jax.device_get(params), "batch_stats": jax.device_get(stats)}
        )
        # Atomic (tmp + rename), matching utils/io_utils.py: per-epoch
        # checkpoints must never leave a truncated file for a concurrent
        # reader (e.g. a bench sweep loading the weights mid-write).
        tmp = out.with_suffix(out.suffix + ".tmp")
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(state_dict))
        tmp.replace(out)

    rng = np.random.default_rng(args.seed)
    n = len(records)
    steps_per_epoch = max(n // args.batch_size, 1)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        t0 = time.perf_counter()
        losses = []
        for s in range(steps_per_epoch):
            idx = order[s * args.batch_size : (s + 1) * args.batch_size]
            if len(idx) < args.batch_size:
                break
            batch = make_batch(records, idx, args.input_size, args.max_faces,
                               domain_aug=args.domain_aug, aug_rng=rng)
            if args.model == "refine":
                batch = sample_refine_targets(batch, rng)
            batch = shard_batch(batch, mesh)
            params, stats, opt_state, metrics = step(params, stats, opt_state, batch)
            losses.append(metrics)
        m = {k: float(np.mean([jax.device_get(x[k]) for x in losses])) for k in
             ("total", "cls", "box", "kps")} if losses else {}
        logger.info(
            f"[epoch {epoch + 1}/{args.epochs}] "
            + " ".join(f"{k}={v:.4f}" for k, v in m.items())
            + f" ({time.perf_counter() - t0:.1f}s)"
        )
        if args.save_every and (epoch + 1) % args.save_every == 0:
            save()
            logger.info(f"checkpointed detector weights → {out}")

    save()
    logger.info(f"saved detector weights → {out}")


if __name__ == "__main__":
    main()
