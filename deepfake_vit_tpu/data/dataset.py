"""CSV-driven dataset + host/device loaders.

Capability parity with reference ``src/data/dataset.py:16-267``
(``PreprocessedFaceDataset``: split-CSV rows filtered to
``processed == True``, PNG → RGB float → ImageNet normalize, real=0/fake=1
labels, optional landmarks/metadata, ``total/(2·count)`` class weights;
``create_dataloaders``: shuffled+drop_last train loader, ordered val/test)
— redesigned for TPU serving:

- images are **NHWC** (the reference emits CHW for cuDNN; XLA wants NHWC),
- the loader is an epoch-seeded batcher whose decode path is either the
  native C++ thread pool (``native/dataloader.cc``) or a Python thread
  pool over cv2 — both GIL-light, replacing torch worker *processes*,
- multi-host training stripes one shared permutation across processes
  (``process_index``/``process_count``), so each host reads a disjoint
  shard of every epoch — the data-parallel half of the SURVEY §2.10 plan,
- :class:`DeviceLoader` overlaps decode with device compute via one-deep
  prefetch and lays batches out over the mesh's data axis.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from queue import Full, Queue
from typing import Any, Dict, Iterable, Optional, Sequence

import numpy as np

from . import native_loader

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

LABEL_MAP = {"real": 0, "fake": 1}


def _path_field(row, key) -> Optional[str]:
    """CSV path cell → str or None. Empty cells read back as NaN (a float,
    and truthy!) — guard both missing columns and NaN/empty values."""
    v = row.get(key)
    if v is None or (isinstance(v, float) and v != v) or v == "":
        return None
    return str(v)


def _load_image(path: str, image_size: int, normalize: bool = True) -> np.ndarray:
    """cv2 decode → RGB float32 NHWC, resized + ImageNet-normalized.

    Matches the reference item pipeline (``dataset.py:80-98``) except the
    layout (HWC, not CHW) and the resize fallback for non-square sources.
    """
    import cv2

    bgr = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if bgr is None:
        return np.zeros((image_size, image_size, 3), dtype=np.float32)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    if rgb.shape[:2] != (image_size, image_size):
        rgb = cv2.resize(rgb, (image_size, image_size), interpolation=cv2.INTER_LINEAR)
    img = rgb.astype(np.float32) / 255.0
    if normalize:
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img


class PreprocessedFaceDataset:
    """Dataset over a split CSV + the faces/landmarks/metadata disk layout.

    CSV schema (written by ``scripts/preprocess_dataset.py``): ``image_id``,
    ``dataset``, ``label`` ('real'/'fake'), ``processed`` (bool),
    ``face_path``/``landmark_path``/``metadata_path`` (relative to
    ``root_dir``), ``quality_score``. Rows with ``processed != True`` are
    dropped at construction (reference ``dataset.py:49-52``).
    """

    def __init__(
        self,
        csv_path,
        root_dir,
        use_landmarks: bool = True,
        load_metadata: bool = False,
        image_size: int = 224,
        normalize: bool = True,
        native_threads: int = 8,
    ):
        import pandas as pd

        df = pd.read_csv(csv_path)
        if "processed" in df.columns:
            df = df[df["processed"] == True]  # noqa: E712 — pandas elementwise
        self.df = df.reset_index(drop=True)
        self.root = Path(root_dir)
        self.use_landmarks = use_landmarks
        self.load_metadata = load_metadata
        self.image_size = int(image_size)
        self.normalize = normalize
        self._native_threads = native_threads
        self._decoder: Optional[native_loader.NativeDecoder] = None
        if not native_loader.is_available():
            # Shadow the method so HostLoader's `callable(...)` probe routes
            # to the per-item Python path (bench_dataloader.py relies on the
            # same instance-attribute override to force a comparison run).
            self.get_batch = None  # type: ignore[assignment]

    def __len__(self) -> int:
        return len(self.df)

    def _row(self, index: int):
        return self.df.iloc[index]

    def __getitem__(self, index: int) -> Dict[str, Any]:
        row = self._row(index)
        item: Dict[str, Any] = {
            "image": _load_image(self.root / row["face_path"], self.image_size, self.normalize),
            "label": np.int32(LABEL_MAP.get(str(row["label"]), 0)),
            "image_id": str(row["image_id"]),
            "dataset": str(row.get("dataset", "")),
            "quality_score": np.float32(row.get("quality_score", 0.0)),
        }
        lm_rel = _path_field(row, "landmark_path")
        if self.use_landmarks and lm_rel:
            lm_path = self.root / lm_rel
            if lm_path.exists():
                item["landmarks"] = np.load(lm_path).astype(np.float32)
            else:
                item["landmarks"] = np.zeros((5, 2), dtype=np.float32)
        md_rel = _path_field(row, "metadata_path")
        if self.load_metadata and md_rel:
            md_path = self.root / md_rel
            if md_path.exists():
                with open(md_path) as f:
                    item["metadata"] = json.load(f)
        return item

    # ------------------------------------------------------------------
    def get_batch(self, indices: Sequence[int]) -> Dict[str, Any]:
        """Batch fetch through the native C++ decode pool.

        Only defined when ``native_loader.is_available()`` — otherwise the
        constructor shadows this with ``None`` and :class:`HostLoader`
        falls back to threaded per-item ``__getitem__``.
        """
        if self._decoder is None:
            self._decoder = native_loader.NativeDecoder(num_threads=self._native_threads)
        rows = [self._row(i) for i in indices]
        paths = [str(self.root / r["face_path"]) for r in rows]
        images, _failed = self._decoder.decode_batch(
            paths, image_size=self.image_size, normalize=self.normalize
        )
        batch: Dict[str, Any] = {
            "image": images,
            "label": np.array(
                [LABEL_MAP.get(str(r["label"]), 0) for r in rows], dtype=np.int32
            ),
            "image_id": [str(r["image_id"]) for r in rows],
            "dataset": [str(r.get("dataset", "")) for r in rows],
            "quality_score": np.array(
                [float(r.get("quality_score", 0.0)) for r in rows], dtype=np.float32
            ),
        }
        if self.use_landmarks and "landmark_path" in self.df.columns:
            lms = []
            for r in rows:
                rel = _path_field(r, "landmark_path")
                p = self.root / rel if rel else None
                if p is not None and p.exists():
                    lms.append(np.load(p).astype(np.float32))
                else:
                    lms.append(np.zeros((5, 2), dtype=np.float32))
            batch["landmarks"] = np.stack(lms)
        return batch

    # ------------------------------------------------------------------
    def get_class_weights(self) -> np.ndarray:
        """Inverse-frequency weights ``total / (2 · count)`` per class
        (reference ``dataset.py:133-147``), ordered [real, fake]."""
        labels = np.array([LABEL_MAP.get(str(l), 0) for l in self.df["label"]])
        total = len(labels)
        weights = np.ones(2, dtype=np.float32)
        for c in (0, 1):
            count = int((labels == c).sum())
            weights[c] = total / (2.0 * count) if count > 0 else 1.0
        return weights

    def get_quality_stats(self) -> Dict[str, float]:
        q = self.df.get("quality_score")
        if q is None or len(q) == 0:
            return {}
        q = np.asarray(q, dtype=np.float64)
        return {
            "mean": float(q.mean()),
            "std": float(q.std()),
            "min": float(q.min()),
            "max": float(q.max()),
        }


def collate_batch(items: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of dataset items into a batch dict.

    Numeric leaves are stacked into leading-batch numpy arrays; strings and
    other non-numeric metadata stay as Python lists (the reference's custom
    collate keeps them list-typed too, ``interface.py:290-301``).
    """
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = vals[0]
        if isinstance(first, (str, dict)) or first is None:
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class HostLoader:
    """Epoch-seeded shuffling batcher with threaded decode.

    Replaces torch ``DataLoader`` semantics the framework relies on:
    ``shuffle`` reshuffles every epoch deterministically from ``seed``
    (``set_epoch`` restores any epoch's order, the resume contract);
    ``drop_last`` keeps batch size static for jit. ``process_index`` /
    ``process_count`` stripe one shared permutation across hosts: every
    process sees a disjoint 1/process_count shard that jointly covers the
    dataset — the multi-host half of data parallelism.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, int(num_workers))
        self.seed = int(seed)
        self.process_index = int(process_index)
        self.process_count = max(1, int(process_count))
        self._epoch = 0
        self._pool: Optional[ThreadPoolExecutor] = None

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    @property
    def epoch(self) -> int:
        return self._epoch

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.process_count == 1:
            return order
        # Stripe the shared order across processes. Wrap-pad the permutation
        # to a multiple of process_count first (torch DistributedSampler
        # semantics) so every process sees the SAME stripe length — unequal
        # stripes make processes disagree on batches-per-epoch and deadlock
        # the first collective of the extra step.
        per_proc = -(-n // self.process_count)
        total = per_proc * self.process_count
        if total > n:
            order = np.concatenate([order, order[: total - n]])
        return order[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._order())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _fetch(self, indices: np.ndarray) -> Dict[str, Any]:
        get_batch = getattr(self.dataset, "get_batch", None)
        if callable(get_batch):
            return get_batch([int(i) for i in indices])
        if self.num_workers > 1:
            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            items = list(self._pool.map(self.dataset.__getitem__, [int(i) for i in indices]))
        else:
            items = [self.dataset[int(i)] for i in indices]
        return collate_batch(items)

    def __iter__(self):
        order = self._order()
        # Epoch auto-advances AT ITERATOR CREATION so plain re-iteration
        # reshuffles like a torch DataLoader across epochs, and an abandoned
        # iterator (e.g. next(iter(loader)) for model init) leaves the same
        # epoch state as a drained one; set_epoch() overrides for resume.
        self._epoch += 1
        bs = self.batch_size
        n_full = len(order) // bs
        for b in range(n_full):
            yield self._fetch(order[b * bs : (b + 1) * bs])
        if not self.drop_last and n_full * bs < len(order):
            yield self._fetch(order[n_full * bs :])


_NUMERIC_KINDS = frozenset("fiub")


class CachedDeviceLoader(HostLoader):
    """HostLoader that stages the WHOLE split on device once, then serves
    every batch by a leading-axis device gather.

    On a high-latency, low-bandwidth host↔device link (the dev tunnel runs
    ~30–55 MB/s) the per-step f32 image upload dominates small-model
    training: b32·224²·3·4 B ≈ 19 MB ≈ 0.4–0.6 s/step against a ~52 ms
    compute step. Decoding the split once and gathering batches on device
    cuts per-step host traffic to the 4·B-byte index vector — a measured
    ~10× epoch-time reduction for the paired-seed A/B harness
    (scripts/experiment_pipeline_ab.py). Batches are identical to
    HostLoader's (same epoch-seeded permutation via the inherited
    ``_order``; images decoded by the same ``get_batch``/``__getitem__``
    path), so training semantics are unchanged — this is purely a data-
    motion optimization, sized for corpora that fit HBM alongside the
    model (~0.6 GB per 1,000 224² f32 faces).

    Capability parity note: the reference keeps its dataset on host and
    re-uploads every batch through torch pinned memory
    (``src/data/dataset.py:160-267``); device residency is the TPU-native
    replacement for that host loop when the corpus allows it.
    """

    _CACHE_KEYS = ("image", "label", "landmarks", "quality_score")

    def __init__(self, *args, mesh=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self._cache: Optional[Dict[str, Any]] = None

    def _stage(self) -> Dict[str, Any]:
        if self._cache is not None:
            return self._cache
        import jax

        n = len(self.dataset)
        get_batch = getattr(self.dataset, "get_batch", None)
        if callable(get_batch):
            host = get_batch(list(range(n)))
        else:
            host = collate_batch([self.dataset[i] for i in range(n)])
        cache: Dict[str, Any] = {}
        for k in self._CACHE_KEYS:
            v = host.get(k)
            if v is None:
                continue
            arr = np.asarray(v)
            if arr.dtype.kind not in _NUMERIC_KINDS:
                continue
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                # Replicate the cache: every device gathers arbitrary rows.
                cache[k] = jax.device_put(arr, NamedSharding(self.mesh, P()))
            else:
                cache[k] = jax.device_put(arr)
        self._cache = cache
        return cache

    def _fetch(self, indices: np.ndarray) -> Dict[str, Any]:
        import jax
        import jax.numpy as jnp

        cache = self._stage()
        idx = jnp.asarray(np.asarray(indices, dtype=np.int32))
        out: Dict[str, Any] = {
            k: jnp.take(v, idx, axis=0) for k, v in cache.items()
        }
        if self.mesh is not None and self.mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            n_dev = self.mesh.devices.size
            placed = {}
            for k, v in out.items():
                if v.ndim >= 1 and v.shape[0] % n_dev == 0:
                    spec = P(DATA_AXIS, *([None] * (v.ndim - 1)))
                else:
                    spec = P()
                placed[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
            return placed
        return out


class DeviceLoader:
    """Mesh-placing, prefetching wrapper around a :class:`HostLoader`.

    Numeric leaves are ``device_put`` with the batch dim sharded over the
    mesh's data axis (replicated instead when the batch doesn't divide the
    device count — only possible on non-drop_last eval tails). Non-numeric
    metadata (image ids, dataset names) is dropped: device batches feed
    jitted steps directly. One batch of host decode is prefetched on a
    background thread so decode overlaps device compute.
    """

    def __init__(self, loader: HostLoader, mesh, axis: Optional[str] = None, prefetch: int = 1):
        from ..parallel.mesh import DATA_AXIS

        self.loader = loader
        self.mesh = mesh
        self.axis = axis or DATA_AXIS
        self.prefetch = max(0, int(prefetch))

    @property
    def dataset(self):
        return self.loader.dataset

    def set_epoch(self, epoch: int) -> None:
        self.loader.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.loader)

    def _place(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = self.mesh.devices.size
        multi_process = jax.process_count() > 1
        out: Dict[str, Any] = {}
        for k, v in batch.items():
            arr = np.asarray(v) if not isinstance(v, (list, dict)) else None
            if arr is None or arr.dtype.kind not in _NUMERIC_KINDS:
                continue
            if arr.ndim >= 1 and arr.shape[0] % n_dev == 0:
                spec = P(self.axis, *([None] * (arr.ndim - 1)))
            else:
                spec = P()
            sharding = NamedSharding(self.mesh, spec)
            if multi_process and spec != P():
                # Each process holds a DISTINCT striped batch (HostLoader
                # striping) — it is the process-local shard of the global
                # batch, NOT a replica. device_put with a global-mesh
                # sharding assumes identical host values on every process
                # and would silently drop all but 1/P of the data; assemble
                # the global array from the local shards instead.
                out[k] = jax.make_array_from_process_local_data(sharding, arr)
            else:
                out[k] = jax.device_put(arr, sharding)
        return out

    def __iter__(self):
        if self.prefetch == 0:
            for batch in self.loader:
                yield self._place(batch)
            return

        q: Queue = Queue(maxsize=self.prefetch)
        _END = object()
        stop = threading.Event()

        def producer():
            try:
                for batch in self.loader:
                    # Bounded put so an abandoned iterator (consumer stopped
                    # pulling) unblocks once `stop` is set instead of leaking
                    # a thread parked on q.put forever.
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except Full:
                            continue
                    if stop.is_set():
                        return
            finally:
                while not stop.is_set():
                    try:
                        q.put(_END, timeout=0.1)
                        break
                    except Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is _END:
                    break
                yield self._place(batch)
        finally:
            # Normal drain or abandonment (GeneratorExit / break): release
            # the producer and reap the thread either way.
            stop.set()
            t.join(timeout=5.0)


def create_dataloaders(
    processed_dir,
    batch_size: int = 64,
    num_workers: int = 4,
    use_landmarks: bool = True,
    mesh=None,
    seed: int = 42,
    splits: Iterable[str] = ("train", "val", "test"),
    image_size: int = 224,
    cache: Optional[str] = None,
) -> Dict[str, Any]:
    """Build loaders for each available split CSV under
    ``{processed_dir}/splits/`` (reference ``dataset.py:160-267``: train is
    shuffled + drop_last, val/test ordered and tail-keeping). When ``mesh``
    is given each loader is wrapped in a :class:`DeviceLoader`. Multi-host
    striping follows ``jax.process_index()``."""
    processed_dir = Path(processed_dir)
    try:
        import jax

        pidx, pcount = jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover — jax always present in this image
        pidx, pcount = 0, 1

    loaders: Dict[str, Any] = {}
    for split in splits:
        csv_path = processed_dir / "splits" / f"{split}.csv"
        if not csv_path.exists():
            continue
        ds = PreprocessedFaceDataset(
            csv_path,
            processed_dir,
            use_landmarks=use_landmarks,
            image_size=image_size,
        )
        is_train = split == "train"
        common = dict(
            batch_size=batch_size,
            shuffle=is_train,
            drop_last=is_train,
            num_workers=num_workers,
            seed=seed,
            process_index=pidx,
            process_count=pcount,
        )
        if cache == "device":
            # Device-resident split: one decode+upload, per-batch device
            # gathers. Batches land already placed — no DeviceLoader wrap.
            loader: Any = CachedDeviceLoader(ds, mesh=mesh, **common)
        else:
            loader = HostLoader(ds, **common)
            if mesh is not None:
                loader = DeviceLoader(loader, mesh)
        loaders[split] = loader
    return loaders
