#!/usr/bin/env python
"""Dataset preprocessing CLI (Stage 1).

Capability parity with reference ``scripts/preprocess_dataset.py:24-431``:
dataset loaders (LFW-FER all-real recursive scan; folder-based real/fake
loaders handling images and videos with frame sampling — every
``frame_stride`` frames, ≤ ``max_frames_per_video``, image ids
``{stem}_f{frame}``), per-item failure rows with reasons, results CSV +
statistics JSON, and seeded 70/15/15 per-(dataset,label) splits.

TPU-native: items are processed in batches — one jitted detect/quality/
align program per batch instead of per-image Python (the reference's
throughput ceiling, SURVEY.md §3.1).
"""

import argparse
import sys
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


# ---------------------------------------------------------------------------
# Dataset item loaders — yield (image_rgb_uint8, image_id, label)
# ---------------------------------------------------------------------------

def load_lfw_fer(cfg: Dict) -> Iterator[Tuple[np.ndarray, str, str]]:
    """LFW-FER: every image is a real face."""
    import cv2

    root = Path(cfg["path"])
    ext = cfg.get("image_extension", ".jpg")
    for p in sorted(root.rglob(f"*{ext}")):
        bgr = cv2.imread(str(p))
        if bgr is None:
            continue
        yield cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB), p.stem, "real"


def _iter_video_frames(path: Path, stride: int, max_frames: int):
    import cv2

    cap = cv2.VideoCapture(str(path))
    taken = 0
    idx = 0
    try:
        while taken < max_frames:
            ok = cap.grab()
            if not ok:
                break
            if idx % stride == 0:
                ok, frame = cap.retrieve()
                if ok:
                    yield idx, cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    taken += 1
            idx += 1
    finally:
        cap.release()


def load_real_fake_folders(cfg: Dict, dataset_name: str) -> Iterator[Tuple[np.ndarray, str, str]]:
    """Generic real/ fake/ folder loader handling images and videos."""
    import cv2

    root = Path(cfg["path"])
    image_exts = cfg.get("image_extensions") or [cfg.get("image_extension", ".png")]
    video_exts = cfg.get("video_extensions", [])
    stride = int(cfg.get("frame_stride", 30))
    max_frames = int(cfg.get("max_frames_per_video", 10))

    for label_key, label in (("real_folder", "real"), ("fake_folder", "fake")):
        folder = root / cfg.get(label_key, label)
        if not folder.is_dir():
            continue
        for p in sorted(folder.rglob("*")):
            suffix = p.suffix.lower()
            if suffix in [e.lower() for e in image_exts]:
                bgr = cv2.imread(str(p))
                if bgr is None:
                    continue
                yield cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB), p.stem, label
            elif suffix in [e.lower() for e in video_exts]:
                for frame_idx, rgb in _iter_video_frames(p, stride, max_frames):
                    yield rgb, f"{p.stem}_f{frame_idx}", label


def load_deeper_forensics(cfg: Dict) -> Iterator[Tuple[np.ndarray, str, str]]:
    return load_real_fake_folders(cfg, "deeper_forensics")


def load_gen_ai(cfg: Dict) -> Iterator[Tuple[np.ndarray, str, str]]:
    return load_real_fake_folders(cfg, "gen_ai")


DATASET_LOADERS = {
    "lfw_fer": load_lfw_fer,
    "deeper_forensics": load_deeper_forensics,
    "gen_ai": load_gen_ai,
}


# ---------------------------------------------------------------------------
# Batched processing
# ---------------------------------------------------------------------------

def process_dataset(
    pipeline,
    items: Iterator[Tuple[np.ndarray, str, str]],
    dataset_name: str,
    output_dir: Path,
    batch_size: int = 16,
    max_images: Optional[int] = None,
    logger=None,
    visualize_dir: Optional[Path] = None,
    save_workers: int = 8,
) -> List[Dict]:
    from concurrent.futures import ThreadPoolExecutor

    log = logger.info if logger else print
    rows: List[Dict] = []
    buf: List[Tuple[np.ndarray, str, str]] = []
    count = 0
    t0 = time.perf_counter()
    # Saves (PNG encode + npy + json per face) ran serially per item in
    # round 2 and dominated CLI wall time; cv2.imwrite releases the GIL, so
    # a thread pool overlaps the whole batch's encodes with the next
    # batch's device compute.
    save_pool = ThreadPoolExecutor(max_workers=max(1, save_workers))

    def _save(out):
        try:
            return dict(
                image_id=out.image_id, dataset=out.dataset, label=out.label,
                processed=True, reason="",
                quality_score=float(out.quality_score),
                confidence=float(out.confidence),
                **pipeline.save_output(out, output_dir),
            )
        except Exception as e:
            return dict(
                image_id=out.image_id, dataset=out.dataset, label=out.label,
                processed=False, reason=f"save_error: {e}",
                face_path="", landmark_path="", metadata_path="",
                quality_score=0.0, confidence=0.0,
            )

    def flush():
        nonlocal rows
        if not buf:
            return
        images = [b[0] for b in buf]
        ids = [b[1] for b in buf]
        labels = [b[2] for b in buf]
        try:
            outputs = pipeline.process_batch(
                images, ids, [dataset_name] * len(buf), labels
            )
        except Exception as e:  # record the whole batch as failed
            for iid, lab in zip(ids, labels):
                rows.append(
                    dict(image_id=iid, dataset=dataset_name, label=lab,
                         processed=False, reason=f"pipeline_error: {e}",
                         face_path="", landmark_path="", metadata_path="",
                         quality_score=0.0, confidence=0.0)
                )
            buf.clear()
            return
        futures = []
        for out in outputs:
            if out.success:
                if visualize_dir is not None and len(rows) < 16:
                    from deepfake_vit_tpu.utils import visualize_pipeline

                    img = images[ids.index(out.image_id)] if out.image_id in ids else None
                    if img is not None:
                        visualize_pipeline(
                            img, out,
                            save_path=visualize_dir / f"{out.dataset}_{out.label}_{out.image_id}.png",
                        )
                futures.append(save_pool.submit(_save, out))
            else:
                rows.append(
                    dict(image_id=out.image_id, dataset=out.dataset, label=out.label,
                         processed=False, reason=out.failure_reason or "unknown",
                         face_path="", landmark_path="", metadata_path="",
                         quality_score=0.0, confidence=0.0)
                )
        rows.extend(f.result() for f in futures)
        buf.clear()

    for image, image_id, label in items:
        if max_images is not None and count >= max_images:
            break
        buf.append((image, image_id, label))
        count += 1
        if len(buf) >= batch_size:
            flush()
            if count % (batch_size * 10) == 0:
                rate = count / (time.perf_counter() - t0)
                log(f"{dataset_name}: {count} items ({rate:.1f} img/s)")
    flush()
    save_pool.shutdown(wait=True)

    ok = sum(1 for r in rows if r["processed"])
    log(f"{dataset_name}: {ok}/{len(rows)} processed successfully")
    return rows


def main():
    parser = argparse.ArgumentParser(description="Preprocess raw datasets (TPU)")
    parser.add_argument("--config", type=str, required=True, help="preprocessing config YAML")
    parser.add_argument(
        "--datasets",
        type=str,
        default="all",
        choices=["lfw_fer", "deeper_forensics", "gen_ai", "all"],
    )
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--save-workers", type=int, default=8,
                        help="threads for the per-face PNG/NPY/JSON save path")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--visualize", action="store_true", help="save pipeline visualizations")
    args = parser.parse_args()

    import pandas as pd

    from deepfake_vit_tpu.data import create_data_splits
    from deepfake_vit_tpu.preprocessing import PreprocessingPipeline
    from deepfake_vit_tpu.utils import load_config, save_json, setup_logger

    config = load_config(args.config)

    from deepfake_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    log_cfg = config.get("logging", {})
    log_file = None
    if log_cfg.get("log_dir"):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        log_file = Path(log_cfg["log_dir"]) / f"preprocessing_{stamp}.log"
    logger = setup_logger("preprocessing", log_file)

    pipeline = PreprocessingPipeline(config)
    output_dir = Path(config.get("output", {}).get("base_dir", "data/processed"))
    output_dir.mkdir(parents=True, exist_ok=True)

    # The tunnel's FIRST uint8 host→device transfer in a process runs far
    # slower than steady state (fixed stall — BASELINE.md round-3); absorb
    # it on 64 bytes here instead of on the first real frame batch.
    # jnp.zeros would NOT warm it (device-side creation).
    import jax
    import numpy as np

    jax.device_get(jax.device_put(np.zeros((8, 8), np.uint8)))

    batch_size = args.batch_size or config.get("pipeline", {}).get("batch_size", 16)
    names = list(DATASET_LOADERS) if args.datasets == "all" else [args.datasets]

    all_rows: List[Dict] = []
    for name in names:
        ds_cfg = config.get("datasets", {}).get(name)
        if not ds_cfg or not Path(ds_cfg.get("path", "")).exists():
            logger.warning(f"dataset {name}: path missing, skipping")
            continue
        logger.info(f"processing dataset: {name}")
        items = DATASET_LOADERS[name](ds_cfg)
        visualize_dir = None
        if args.visualize:
            visualize_dir = output_dir / "visualizations"
            visualize_dir.mkdir(parents=True, exist_ok=True)
        all_rows.extend(
            process_dataset(
                pipeline, items, name, output_dir,
                batch_size=batch_size, max_images=args.max_images, logger=logger,
                visualize_dir=visualize_dir, save_workers=args.save_workers,
            )
        )

    if not all_rows:
        logger.error("no items processed")
        sys.exit(1)

    results_df = pd.DataFrame(all_rows)
    results_csv = output_dir / "preprocessing_results.csv"
    results_df.to_csv(results_csv, index=False)
    logger.info(f"wrote {results_csv} ({len(results_df)} rows)")

    stats = pipeline.get_statistics()
    save_json(stats, output_dir / "preprocessing_statistics.json")
    logger.info(f"statistics: {stats}")

    create_data_splits(results_df, output_dir, random_seed=config.get("seed", 42), logger=logger)


if __name__ == "__main__":
    main()
