"""Bitwise-comparable train/val/test split generation.

DELIBERATE BEHAVIORAL REPLICATION: BASELINE.md names bitwise-comparable
split CSVs as a target, which is achievable only by reproducing the exact
pandas RNG call sequence of the reference
(``/root/reference/scripts/preprocess_dataset.py:238-314``): filter
``processed == True``, then per (dataset, label) cell
``sample(frac=1, random_state=seed)`` → 70/15/15 cut by
``int(n·ratio)`` arithmetic, then one final per-split
``sample(frac=1, random_state=seed)`` shuffle. Any other call order
produces different (if equally valid) splits, breaking cross-framework
AUC comparison on identical data. ~40 functional lines; adjudicated
category (b) in round 1.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict


def create_data_splits(
    results_df,
    output_dir,
    train_ratio: float = 0.7,
    val_ratio: float = 0.15,
    test_ratio: float = 0.15,
    random_seed: int = 42,
    logger=None,
) -> Dict[str, "object"]:
    """Write ``splits/{train,val,test}.csv`` under ``output_dir``.

    Stratified per (dataset, label) cell so every split keeps the same
    real/fake × source-dataset balance; seeded so regeneration from the
    same results CSV (same row order) is bitwise identical.
    """
    import pandas as pd

    valid_df = results_df[results_df["processed"] == True].copy()  # noqa: E712

    splits: Dict[str, list] = {}
    for dataset in valid_df["dataset"].unique():
        for label in valid_df["label"].unique():
            subset = valid_df[
                (valid_df["dataset"] == dataset) & (valid_df["label"] == label)
            ]
            if len(subset) == 0:
                continue
            subset = subset.sample(frac=1, random_state=random_seed).reset_index(drop=True)
            n = len(subset)
            train_end = int(n * train_ratio)
            val_end = train_end + int(n * val_ratio)
            for name, part in (
                ("train", subset[:train_end]),
                ("val", subset[train_end:val_end]),
                ("test", subset[val_end:]),
            ):
                splits.setdefault(name, []).append(part)

    splits_dir = Path(output_dir) / "splits"
    splits_dir.mkdir(parents=True, exist_ok=True)

    final: Dict[str, "object"] = {}
    for name, parts in splits.items():
        df = pd.concat(parts, ignore_index=True)
        df = df.sample(frac=1, random_state=random_seed).reset_index(drop=True)
        df.to_csv(splits_dir / f"{name}.csv", index=False)
        final[name] = df
        if logger is not None:
            real = int((df["label"] == "real").sum())
            fake = int((df["label"] == "fake").sum())
            logger.info(f"{name} split: {len(df)} images (real {real} / fake {fake})")
    return final
