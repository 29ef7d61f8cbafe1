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


def test_single_process_default_unchanged():
    ds = _ArrayDataset(10)
    loader = HostLoader(ds, batch_size=5, process_index=0, process_count=1)
    total = sum(len(b["label"]) for b in loader)
    assert total == 10
