"""Multi-host data sharding: disjoint per-process slices, full coverage."""

import numpy as np
import pytest

from faceoff_tpu.data import synthetic
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    synthetic.generate_dataset(str(root), n_videos=6, n_frames=6, size=32)
    return str(root)


def test_shards_disjoint_and_cover(synth_root):
    ds = TemporalAlignmentDataset(synth_root, "train", 2, resolution=32)
    orders = []
    for idx in range(3):
        loader = DataLoader(
            ds, batch_clips=1, num_workers=1, seed=7,
            shard_index=idx, shard_count=3,
        )
        orders.append(set(loader._epoch_order().tolist()))
    union = set().union(*orders)
    assert union == set(range(6))
    for a in range(3):
        for b in range(a + 1, 3):
            assert not (orders[a] & orders[b])


def test_len_reflects_shard(synth_root):
    ds = TemporalAlignmentDataset(synth_root, "train", 2, resolution=32)
    full = DataLoader(ds, batch_clips=1, num_workers=1)
    shard = DataLoader(ds, batch_clips=1, num_workers=1, shard_count=3)
    assert len(full) == 6
    assert len(shard) == 2
