"""CachedDeviceLoader + serving-matched preprocessing warp knob.

The cached loader must be a pure data-motion optimization: identical
batches (order AND values) to the HostLoader it replaces, so training
semantics are unchanged (the trainer contract of
``src/training/trainer.py:23-361`` does not change with the loader).
The aligner warp knob must route crops through the SAME windowed warp the
serving FusedPipeline uses (reference warp semantics:
``src/preprocessing/face_aligner.py:102-128``).
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from deepfake_vit_tpu.data import (
    CachedDeviceLoader,
    HostLoader,
    PreprocessedFaceDataset,
    create_data_splits,
    create_dataloaders,
)


@pytest.fixture(scope="module")
def processed_dir(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(3)
    base = tmp_path_factory.mktemp("processed_cache")
    (base / "faces").mkdir()
    (base / "landmarks").mkdir()
    rows = []
    for i in range(24):
        label = "real" if i % 2 == 0 else "fake"
        stem = f"genai_{label}_{i:06d}"
        img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(base / "faces" / f"{stem}.png"), img)
        np.save(base / "landmarks" / f"{stem}.npy",
                rng.uniform(0, 64, (5, 2)).astype(np.float32))
        rows.append(dict(image_id=f"{i:06d}", dataset="genai", label=label,
                         processed=True, face_path=f"faces/{stem}.png",
                         landmark_path=f"landmarks/{stem}.npy",
                         metadata_path="", quality_score=0.5))
    create_data_splits(pd.DataFrame(rows), base, random_seed=42)
    return base


def _mk(loader_cls, ds, **kw):
    return loader_cls(ds, batch_size=8, shuffle=True, drop_last=True,
                      seed=11, **kw)


def test_cached_loader_matches_host_loader(processed_dir):
    ds = PreprocessedFaceDataset(processed_dir / "splits" / "train.csv",
                                 processed_dir, image_size=64)
    host = _mk(HostLoader, ds)
    cached = _mk(CachedDeviceLoader, ds)
    for epoch in range(2):
        hb = list(host)
        cb = list(cached)
        assert len(hb) == len(cb) == len(host)
        for h, c in zip(hb, cb):
            np.testing.assert_array_equal(h["label"], np.asarray(c["label"]))
            np.testing.assert_allclose(
                h["image"], np.asarray(c["image"]), rtol=0, atol=0
            )
            np.testing.assert_array_equal(
                h["landmarks"], np.asarray(c["landmarks"])
            )


def test_cached_loader_set_epoch_resume(processed_dir):
    ds = PreprocessedFaceDataset(processed_dir / "splits" / "train.csv",
                                 processed_dir, image_size=64)
    a = _mk(CachedDeviceLoader, ds)
    _ = list(a)  # epoch 1
    labels_e2 = [np.asarray(b["label"]) for b in a]  # epoch 2
    b = _mk(CachedDeviceLoader, ds)
    b.set_epoch(1)  # next iteration = epoch 2
    labels_resume = [np.asarray(x["label"]) for x in b]
    for x, y in zip(labels_e2, labels_resume):
        np.testing.assert_array_equal(x, y)


def test_create_dataloaders_cache_device_with_mesh(processed_dir):
    from deepfake_vit_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh()
    loaders = create_dataloaders(processed_dir, batch_size=8, mesh=mesh,
                                 image_size=64, cache="device")
    batch = next(iter(loaders["train"]))
    assert batch["image"].shape == (8, 64, 64, 3)
    # Placed over the full 8-device data axis like DeviceLoader batches.
    assert len(batch["image"].sharding.device_set) == 8
    # And numerically equal to the uncached path's first batch.
    plain = create_dataloaders(processed_dir, batch_size=8, mesh=mesh,
                               image_size=64)
    ref = next(iter(plain["train"]))
    np.testing.assert_allclose(np.asarray(ref["image"]),
                               np.asarray(batch["image"]), rtol=0, atol=0)


def test_aligner_warp_window_matches_windowed_warp():
    import jax.numpy as jnp

    from deepfake_vit_tpu.ops.warp import warp_affine_windowed
    from deepfake_vit_tpu.preprocessing.aligner import FaceAligner

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 96, 96, 3)).astype(np.float32)
    # Landmarks spread across the frame so the quad exceeds the window.
    lms = np.stack([
        np.array([[20, 25], [70, 25], [45, 50], [25, 72], [68, 72]], np.float32),
        np.array([[10, 30], [85, 28], [48, 55], [20, 80], [80, 80]], np.float32),
    ])
    exact = FaceAligner(output_size=(48, 48))
    windowed = FaceAligner(output_size=(48, 48), warp_window=64,
                           warp_fractional=True)
    a_exact, _, tform = exact._align_jit(jnp.asarray(frames), jnp.asarray(lms))
    a_win, _, tform_w = windowed._align_jit(jnp.asarray(frames), jnp.asarray(lms))
    np.testing.assert_allclose(np.asarray(tform), np.asarray(tform_w),
                               rtol=1e-6, atol=1e-6)
    ref = warp_affine_windowed(jnp.asarray(frames), jnp.asarray(tform),
                               (48, 48), window=64, fractional=True)
    # tform is recomputed inside the aligner graph (different f32 fusion
    # than the host round-trip feeding `ref`) — bitwise equality is not
    # expected, 0.01/255 is far below quantization.
    np.testing.assert_allclose(np.asarray(a_win), np.asarray(ref),
                               rtol=1e-4, atol=1e-2)
    # The knob actually changes the crops (faces span > window here) but
    # stays close to the exact warp overall.
    assert not np.allclose(np.asarray(a_win), np.asarray(a_exact))


def test_pipeline_plumbs_warp_window():
    from deepfake_vit_tpu.preprocessing.pipeline import PreprocessingPipeline

    cfg = {
        "detection": {"method": "scrfd", "scrfd": {"input_size": [160, 160]}},
        "alignment": {"output_size": [64, 64], "warp_window": 96,
                      "warp_fractional": True},
        "quality": {"enabled": False},
    }
    pipe = PreprocessingPipeline(cfg)
    assert pipe.aligner.warp_window == 96
    assert pipe.aligner.warp_fractional is True
