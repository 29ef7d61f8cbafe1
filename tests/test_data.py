"""Data layer tests (reference parity: dataset schema/filtering of
``src/data/dataset.py``, interface of ``src/data/interface.py``, split
semantics of ``scripts/preprocess_dataset.py:238-314``)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from deepfake_vit_tpu.data import (
    FeatureExtractionInput,
    HostLoader,
    PreprocessedFaceDataset,
    PreprocessingToFeatureInterface,
    collate_batch,
    create_data_splits,
    create_dataloaders,
)
from deepfake_vit_tpu.preprocessing import PreprocessingOutput


@pytest.fixture(scope="module")
def processed_dir(tmp_path_factory):
    """Synthesize a tiny processed dataset on disk (reference disk contract)."""
    import cv2

    rng = np.random.default_rng(0)
    base = tmp_path_factory.mktemp("processed")
    (base / "faces").mkdir()
    (base / "landmarks").mkdir()
    (base / "metadata").mkdir()

    rows = []
    for i in range(24):
        label = "real" if i % 2 == 0 else "fake"
        stem = f"genai_{label}_{i:06d}"
        img = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        cv2.imwrite(str(base / "faces" / f"{stem}.png"), img)
        np.save(base / "landmarks" / f"{stem}.npy", rng.uniform(0, 224, (5, 2)).astype(np.float32))
        with open(base / "metadata" / f"{stem}.json", "w") as f:
            json.dump({"image_id": f"{i:06d}"}, f)
        rows.append(
            dict(
                image_id=f"{i:06d}",
                dataset="genai",
                label=label,
                processed=True,
                face_path=f"faces/{stem}.png",
                landmark_path=f"landmarks/{stem}.npy",
                metadata_path=f"metadata/{stem}.json",
                quality_score=0.8,
            )
        )
    # One unprocessed row that must be filtered out.
    rows.append(
        dict(image_id="bad", dataset="genai", label="real", processed=False,
             face_path="", landmark_path="", metadata_path="", quality_score=0.0)
    )
    df = pd.DataFrame(rows)
    create_data_splits(df, base, random_seed=42)
    return base


def test_dataset_filtering_and_item(processed_dir):
    ds = PreprocessedFaceDataset(processed_dir / "splits" / "train.csv", processed_dir)
    assert len(ds) > 0
    item = ds[0]
    assert item["image"].shape == (224, 224, 3)
    assert item["image"].dtype == np.float32
    assert item["label"] in (0, 1)
    assert item["landmarks"].shape == (5, 2)
    # Normalized: mean roughly centered (ImageNet stats applied).
    assert abs(float(item["image"].mean())) < 3.0


def test_class_weights(processed_dir):
    ds = PreprocessedFaceDataset(processed_dir / "splits" / "train.csv", processed_dir)
    w = ds.get_class_weights()
    assert w.shape == (2,)
    assert np.all(w > 0)


def test_splits_are_seeded_and_disjoint(processed_dir, tmp_path):
    train = pd.read_csv(processed_dir / "splits" / "train.csv")
    val = pd.read_csv(processed_dir / "splits" / "val.csv")
    test = pd.read_csv(processed_dir / "splits" / "test.csv")
    ids = list(train.image_id) + list(val.image_id) + list(test.image_id)
    assert len(set(ids)) == len(ids) == 24  # unprocessed row excluded
    # 70/15/15 per (dataset, label) cell: 12 per label → 8/1/3 each.
    assert len(train) == 16 and len(val) == 2 and len(test) == 6

    # Determinism: regenerating with the same seed *and same input row order*
    # is bitwise identical (the reference contract — splits depend on the
    # results CSV order).
    df = (
        pd.concat([train, val, test], ignore_index=True)
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    create_data_splits(df, tmp_path, random_seed=42)
    train2 = pd.read_csv(tmp_path / "splits" / "train.csv")
    pd.testing.assert_frame_equal(
        train.sort_values("image_id").reset_index(drop=True)[["image_id", "label"]],
        train2.sort_values("image_id").reset_index(drop=True)[["image_id", "label"]],
    )


def test_host_loader_batching(processed_dir):
    ds = PreprocessedFaceDataset(processed_dir / "splits" / "train.csv", processed_dir)
    loader = HostLoader(ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    b = batches[0]
    assert b["image"].shape == (8, 224, 224, 3)
    assert b["label"].shape == (8,)
    assert b["landmarks"].shape == (8, 5, 2)

    # Shuffle is epoch-seeded: two fresh loaders agree epoch by epoch.
    l1 = HostLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=7)
    l2 = HostLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=7)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["label"], b2["label"])


def test_create_dataloaders_with_mesh(processed_dir):
    from deepfake_vit_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh()
    loaders = create_dataloaders(processed_dir, batch_size=8, mesh=mesh)
    assert set(loaders.keys()) == {"train", "val", "test"}
    batch = next(iter(loaders["train"]))
    assert batch["image"].shape == (8, 224, 224, 3)
    # Sharded over the 8-device data axis.
    assert len(batch["image"].sharding.device_set) == 8


def test_interface_roundtrip(rng):
    outputs = [
        PreprocessingOutput(
            aligned_face=rng.integers(0, 255, size=(224, 224, 3)).astype(np.uint8),
            landmarks=rng.uniform(0, 224, (5, 2)).astype(np.float32),
            quality_score=0.9,
            image_id=f"id{i}",
            dataset="genai",
            label="fake",
            confidence=0.99,
            success=True,
        )
        for i in range(4)
    ]
    iface = PreprocessingToFeatureInterface()
    fe = iface.preprocessing_outputs_to_batch(outputs)
    assert fe.images.shape == (4, 224, 224, 3)
    assert fe.landmarks.shape == (4, 5, 2)
    assert fe.labels.tolist() == [1, 1, 1, 1]
    assert fe.batch_size == 4

    maps = iface.create_landmark_attention_maps(fe.landmarks, (7, 7))
    assert maps.shape == (4, 1, 7, 7)
    assert maps.max() <= 1.0 + 1e-6

    dev = fe.to_device()
    assert dev["image"].shape == (4, 224, 224, 3)
