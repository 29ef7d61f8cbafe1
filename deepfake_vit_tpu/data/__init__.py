"""Data layer (the Stage-1 → Stage-2 bridge).

Capability parity with reference ``src/data/`` (``dataset.py``,
``interface.py``) plus the split generation of
``scripts/preprocess_dataset.py:238-314``:

- :class:`PreprocessedFaceDataset` — CSV-driven dataset over the on-disk
  faces/landmarks/metadata layout, ``processed == True`` filtering,
  real=0/fake=1 labels, inverse-frequency class weights.
- :class:`HostLoader` — epoch-seeded shuffling batcher with a decode thread
  pool and per-process stripes for multi-host training (the TPU-native
  replacement for torch ``DataLoader(num_workers=4)``).
- :class:`DeviceLoader` — wraps a HostLoader and places numeric batches on a
  ``jax.sharding.Mesh`` (batch dim over the data axis) with one-deep
  prefetch to overlap host decode with device compute.
- :func:`create_dataloaders` — the train/val/test factory.
- :class:`FeatureExtractionInput` / :class:`PreprocessingToFeatureInterface`
  — in-memory Stage-1 → Stage-2 handoff.
- :func:`create_data_splits` — bitwise-comparable 70/15/15 split CSVs.
- :mod:`native_loader` — ctypes bindings for the C++ decode core
  (``native/dataloader.cc``).
"""

from . import native_loader
from .dataset import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    CachedDeviceLoader,
    DeviceLoader,
    HostLoader,
    PreprocessedFaceDataset,
    collate_batch,
    create_dataloaders,
)
from .interface import (
    FeatureExtractionInput,
    PreprocessingToFeatureInterface,
    batch_to_device,
    collate_preprocessing_outputs,
)
from .splits import create_data_splits

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "CachedDeviceLoader",
    "DeviceLoader",
    "FeatureExtractionInput",
    "HostLoader",
    "PreprocessedFaceDataset",
    "PreprocessingToFeatureInterface",
    "batch_to_device",
    "collate_batch",
    "collate_preprocessing_outputs",
    "create_data_splits",
    "create_dataloaders",
    "native_loader",
]
