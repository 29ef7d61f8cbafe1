#!/usr/bin/env python
"""Data-loading throughput harness.

Capability parity with reference ``scripts/test_dataloader.py:137-168``
(batches/s, ms/batch, samples/s over N batches), extended to compare the
Python/cv2 thread pool vs the native C++ decode core.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))



def measure(loader, n_batches: int, label: str):
    it = iter(loader)
    next(it)  # warm
    t0 = time.perf_counter()
    count = 0
    samples = 0
    for batch in it:
        count += 1
        samples += len(batch["label"])
        if count >= n_batches:
            break
    dt = time.perf_counter() - t0
    if count == 0:
        print(f"{label}: no batches")
        return
    print(
        f"{label}: {count / dt:.2f} batches/s, {dt / count * 1e3:.2f} ms/batch, "
        f"{samples / dt:.1f} samples/s"
    )


def main():
    parser = argparse.ArgumentParser(description="Measure dataloader throughput")
    parser.add_argument("--processed-dir", type=str, default="data/processed")
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--batches", type=int, default=50)
    args = parser.parse_args()

    from deepfake_vit_tpu.data import HostLoader, PreprocessedFaceDataset
    from deepfake_vit_tpu.data import native_loader

    csv_path = Path(args.processed_dir) / "splits" / f"{args.split}.csv"
    if not csv_path.exists():
        print(f"no split CSV at {csv_path} — run preprocess_dataset.py first")
        sys.exit(1)

    ds = PreprocessedFaceDataset(csv_path, args.processed_dir)
    print(f"dataset: {len(ds)} samples; native loader available: {native_loader.is_available()}")

    loader = HostLoader(ds, batch_size=args.batch_size, shuffle=True,
                        drop_last=True, num_workers=args.num_workers)
    measure(loader, args.batches, "native+threads" if native_loader.is_available() else "python threads")

    if native_loader.is_available():
        # Force the pure-Python path for comparison.
        ds_py = PreprocessedFaceDataset(csv_path, args.processed_dir)
        ds_py.get_batch = None  # type: ignore[assignment]
        loader_py = HostLoader(ds_py, batch_size=args.batch_size, shuffle=True,
                               drop_last=True, num_workers=args.num_workers)
        measure(loader_py, args.batches, "python threads")


if __name__ == "__main__":
    main()
