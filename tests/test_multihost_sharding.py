"""Multi-host data sharding semantics (per-process stripes of a shared
shuffle) — the multi-process half of the data-parallel contract."""

import numpy as np

from deepfake_vit_tpu.data.dataset import HostLoader


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "image": np.full((4, 4, 3), i, np.float32),
            "label": np.int32(i % 2),
            "image_id": str(i),
            "dataset": "x",
            "quality_score": np.float32(1.0),
        }


def test_process_shards_are_disjoint_and_cover():
    ds = _ArrayDataset(64)
    seen = []
    for p in range(4):
        loader = HostLoader(
            ds, batch_size=4, shuffle=True, seed=7,
            process_index=p, process_count=4,
        )
        ids = []
        for batch in loader:
            ids.extend(batch["image"][:, 0, 0, 0].astype(int).tolist())
        assert len(ids) == 16  # 64 / 4 hosts
        seen.append(set(ids))

    union = set().union(*seen)
    assert len(union) == 64  # full coverage
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (seen[a] & seen[b])  # disjoint


def test_uneven_dataset_equal_stripes():
    """n=127, 2 procs: stripes wrap-pad to 64 each so every process agrees
    on batches-per-epoch (DistributedSampler semantics) — unequal stripes
    deadlock the first collective of the extra step."""
    ds = _ArrayDataset(127)
    lens = []
    seen = set()
    for p in range(2):
        loader = HostLoader(
            ds, batch_size=32, shuffle=True, drop_last=True, seed=3,
            process_index=p, process_count=2,
        )
        assert len(loader) == 2  # 64 // 32, identical on both processes
        ids = []
        for batch in loader:
            ids.extend(batch["image"][:, 0, 0, 0].astype(int).tolist())
        lens.append(len(ids))
        seen.update(ids)
    assert lens[0] == lens[1] == 64
    # Coverage: wrap-padding duplicates at most (P-1) items.
    assert len(seen) >= 126


def test_epoch_advances_on_iterator_creation():
    """Abandoned iterators (e.g. next(iter(loader)) for model init) advance
    the epoch exactly like drained ones — order stays deterministic."""
    ds = _ArrayDataset(16)
    a = HostLoader(ds, batch_size=4, shuffle=True, seed=11)
    b = HostLoader(ds, batch_size=4, shuffle=True, seed=11)
    next(iter(a))  # abandoned mid-epoch
    first_a = next(iter(a))["image"][:, 0, 0, 0].tolist()
    for _ in b:  # fully drained
        pass
    first_b = next(iter(b))["image"][:, 0, 0, 0].tolist()
    assert first_a == first_b
    # set_epoch still pins the order exactly.
    a.set_epoch(0)
    b.set_epoch(0)
    assert next(iter(a))["image"][:, 0, 0, 0].tolist() == \
        next(iter(b))["image"][:, 0, 0, 0].tolist()


def test_single_process_default_unchanged():
    ds = _ArrayDataset(10)
    loader = HostLoader(ds, batch_size=5, process_index=0, process_count=1)
    total = sum(len(b["label"]) for b in loader)
    assert total == 10
