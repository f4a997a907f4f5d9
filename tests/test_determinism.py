"""Reproducibility guarantees (DESIGN.md §7): same seeds -> bitwise-same
batches and training trajectories; error paths surface cleanly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.data import synthetic
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader
from faceoff_tpu.models import VQVAE
from faceoff_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("determinism")
    synthetic.generate_dataset(str(root), n_videos=2, n_frames=8, size=64)
    return str(root)


def tiny_model():
    return VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )


class TestDeterminism:
    def test_loader_bitwise_reproducible(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)

        def epoch_batches():
            loader = DataLoader(ds, batch_clips=1, num_workers=2, seed=42)
            return [b["input"].copy() for b in loader]

        a, b = epoch_batches(), epoch_batches()
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_training_trajectory_reproducible(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)

        def run():
            model = tiny_model()
            loader = DataLoader(ds, batch_clips=1, num_workers=1, seed=7)
            state = create_train_state(
                model, jax.random.key(0), jnp.zeros((1, 4, 64, 64, 6)),
                lr=1e-3,
            )
            step = make_train_step(model, donate=False)
            losses = []
            for batch in loader:
                state, m = step(
                    state,
                    {
                        "input": jnp.asarray(batch["input"]),
                        "gt": jnp.asarray(batch["gt"]),
                    },
                )
                losses.append(float(m["loss"]))
            return losses

        np.testing.assert_array_equal(run(), run())

    def test_device_pipeline_reproducible(self, synth_root):
        from faceoff_tpu.data.device_pipeline import (
            RawClipLoader,
            prepare_train_batch,
        )

        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)

        def run():
            loader = RawClipLoader(ds, batch_clips=1, num_workers=2, seed=3)
            batch = next(iter(loader))
            out = prepare_train_batch(
                jax.random.key(11),
                jnp.asarray(batch["frames"]),
                jnp.asarray(batch["landmarks"]),
            )
            return np.asarray(out["input"])

        np.testing.assert_array_equal(run(), run())


class TestErrorPaths:
    def test_restore_missing_checkpoint_raises(self, tmp_path):
        from faceoff_tpu.io.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "empty"))
        state = create_train_state(
            tiny_model(), jax.random.key(0), jnp.zeros((1, 2, 32, 32, 6))
        )
        with pytest.raises(FileNotFoundError):
            mgr.restore(state)
        with pytest.raises(FileNotFoundError):
            mgr.restore_weights(state)
        mgr.close()

    def test_loader_propagates_worker_errors(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)

        class Broken:
            def __len__(self):
                return 2

            def get_item(self, index, rng):
                raise RuntimeError("worker boom")

        loader = DataLoader(Broken(), batch_clips=1, num_workers=2)
        with pytest.raises(RuntimeError, match="worker boom"):
            next(iter(loader))

    def test_empty_dataset_root_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            TemporalAlignmentDataset(str(tmp_path), "train", 4)
