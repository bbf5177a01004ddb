"""BatchLoader: determinism, sharding, infinite streams."""

import numpy as np

from mafed_tpu.data.loader import BatchLoader


class RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.asarray([i], np.int32)}


def collate(items):
    return {"x": np.concatenate([it["x"] for it in items])}


def batches_of(loader, limit=None):
    out = []
    for i, b in enumerate(loader):
        if limit is not None and i >= limit:
            break
        out.append(b["x"].tolist())
    return out


def test_deterministic_shuffle():
    a = batches_of(BatchLoader(RangeDataset(16), 4, collate, shuffle=True, seed=3))
    b = batches_of(BatchLoader(RangeDataset(16), 4, collate, shuffle=True, seed=3))
    assert a == b
    c = batches_of(BatchLoader(RangeDataset(16), 4, collate, shuffle=True, seed=4))
    assert a != c


def test_drop_last():
    loader = BatchLoader(RangeDataset(10), 4, collate, drop_last=True)
    out = batches_of(loader)
    assert len(out) == 2 == len(loader)
    loader2 = BatchLoader(RangeDataset(10), 4, collate, drop_last=False)
    assert len(batches_of(loader2)) == 3


def test_sharding_partitions_data():
    """Shards are disjoint and cover the dataset (DistributedSampler parity)."""
    seen = []
    for shard in range(4):
        loader = BatchLoader(
            RangeDataset(32), 4, collate, shuffle=True, seed=7,
            shard_id=shard, num_shards=4,
        )
        for b in loader:
            seen.extend(b["x"].tolist())
    assert sorted(seen) == list(range(32))


def test_infinite_stream_reshuffles_epochs():
    loader = BatchLoader(RangeDataset(8), 4, collate, shuffle=True, seed=0, infinite=True)
    out = batches_of(loader, limit=6)  # 3 epochs worth
    assert len(out) == 6
    epoch0 = sorted(out[0] + out[1])
    epoch1 = sorted(out[2] + out[3])
    assert epoch0 == epoch1 == list(range(8))
    assert out[0] + out[1] != out[2] + out[3]  # reshuffled


def test_loader_propagates_collate_errors():
    """A collate/dataset exception must surface to the consumer, not
    silently end the epoch (the label_tail guard depends on this)."""
    import pytest

    from mafed_tpu.data.loader import BatchLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": i}

    def bad_collate(items):
        raise ValueError("label_tail violated")

    loader = BatchLoader(DS(), batch_size=4, collate=bad_collate, num_workers=2)
    with pytest.raises(ValueError, match="label_tail violated"):
        list(loader)
