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


def test_cli_factory_shards_train_loader(synth_root, tmp_path, monkeypatch):
    """The trainer factory wires per-process data sharding from the process
    identity (role of the reference's DistributedSampler,
    distributed/distributed.py:135-143): with 2 simulated processes each
    rank's train loader iterates a disjoint half."""
    from faceoff_tpu.cli import train_faceoff_perceptual as cli
    from faceoff_tpu.parallel import collectives

    def build(rank):
        monkeypatch.setattr(collectives, "get_rank", lambda: rank)
        monkeypatch.setattr(collectives, "get_world_size", lambda: 2)
        args = cli.build_parser().parse_args([
            "--data_root", synth_root, "--size", "64",
            "--train_frames", "2", "--val_frames", "2",
            "--num_workers", "1",
            "--sample_folder", str(tmp_path / f"s{rank}"),
            "--checkpoint_dir", str(tmp_path / f"c{rank}"),
            "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
            "--embed_dim", "8", "--n_embed", "32",
        ])
        trainer, _ = cli.build_everything(args)
        return trainer.train_loader

    l0, l1 = build(0), build(1)
    full = DataLoader(
        TemporalAlignmentDataset(synth_root, "train", 2, resolution=64),
        batch_clips=1, num_workers=1,
    )
    assert len(l0) + len(l1) <= len(full)
    assert len(l0) >= 1 and len(l1) >= 1
