"""Integration: full trainer loop on synthetic data + exact checkpoint resume."""

import os.path as osp
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu import config as config_lib
from faceoff_tpu.data import synthetic
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.models import VQVAE
from faceoff_tpu.parallel import make_mesh
from faceoff_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from faceoff_tpu.train.trainer import Trainer, run_validation


def tiny_model():
    return VQVAE(
        in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
        embed_dim=8, n_embed=32, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_synth")
    synthetic.generate_dataset(str(root), n_videos=2, n_frames=8, size=64)
    return str(root)


def build_trainer(synth_root, tmp_path, epochs=1):
    cfg = config_lib.Config(
        train=config_lib.TrainConfig(
            epochs=epochs,
            validate_at=10_000,  # keep epochs fast; validate explicitly
            checkpoint_dir=str(tmp_path / "ckpt"),
            sample_folder=str(tmp_path / "samples"),
        )
    )
    model = tiny_model()
    ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
    loader = DataLoader(ds, batch_clips=1, num_workers=2, seed=0)
    val_ds = TemporalAlignmentDataset(synth_root, "val", 4, resolution=64)
    val_loader = DataLoader(val_ds, batch_clips=1, shuffle=False, num_workers=2)

    sample = jnp.zeros((1, 4, 64, 64, 6))
    state = create_train_state(model, jax.random.key(0), sample, lr=1e-3)
    train_step = make_train_step(model, donate=False)
    eval_step = make_eval_step(model)
    mesh = make_mesh(data=1)
    return Trainer(
        cfg, model, state, train_step, eval_step, loader, val_loader, mesh=mesh
    )


class TestTrainer:
    def test_epoch_runs_and_loss_finite(self, synth_root, tmp_path):
        trainer = build_trainer(synth_root, tmp_path)
        logger = trainer.train_epoch(0)
        assert np.isfinite(logger.avg_mse)
        assert trainer.global_step == len(trainer.train_loader)

    def test_validation_writes_mp4(self, synth_root, tmp_path):
        trainer = build_trainer(synth_root, tmp_path)
        run_validation(
            trainer.eval_step, trainer.state, trainer.val_loader,
            str(tmp_path / "samples"), 0, 0, mesh=trainer.mesh, max_batches=1,
        )
        vids = glob(str(tmp_path / "samples" / "*.mp4"))
        # file names are {epoch}_{step}_{i}_{stream}.mp4
        names = {
            osp.basename(v)[:-4].split("_", 3)[-1] for v in vids
        }
        assert names == {
            "source", "background", "prediction", "source_images",
        }


class TestCheckpoint:
    def test_roundtrip_exact(self, synth_root, tmp_path):
        trainer = build_trainer(synth_root, tmp_path)
        # advance a couple of steps
        batch = next(iter(trainer.train_loader))
        from faceoff_tpu.parallel import shard_batch

        b = shard_batch(batch, trainer.mesh)
        trainer.state, _ = trainer.train_step(trainer.state, b, None)
        trainer.state, _ = trainer.train_step(trainer.state, b, None)

        mgr = CheckpointManager(str(tmp_path / "ckpt2"), keep=2)
        mgr.save(2, trainer.state)

        # fresh state, restore
        sample = jnp.zeros((1, 4, 64, 64, 6))
        fresh = create_train_state(
            tiny_model(), jax.random.key(42), sample, lr=1e-3
        )
        restored = mgr.restore(fresh)
        assert int(restored.step) == 2
        for a, b_ in zip(
            jax.tree_util.tree_leaves(trainer.state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        # training continues from the restored state
        restored, metrics = trainer.train_step(restored, b, None)
        assert np.isfinite(float(metrics["loss"]))
        mgr.close()


class TestWarmStart:
    def test_gan_generator_warm_start(self, synth_root, tmp_path):
        """restore_weights loads perceptual-stage weights into a fresh
        generator state regardless of optimizer (the pretrain ->
        GAN-finetune workflow)."""
        from faceoff_tpu.train.state import make_optimizer

        trainer = build_trainer(synth_root, tmp_path)
        batch = next(iter(trainer.train_loader))
        from faceoff_tpu.parallel import shard_batch

        b = shard_batch(batch, trainer.mesh)
        trainer.state, _ = trainer.train_step(trainer.state, b, None)
        mgr = CheckpointManager(str(tmp_path / "warm"), keep=1)
        mgr.save(1, trainer.state)

        # fresh state under a DIFFERENT optimizer (adam b1=0.5 like the
        # GAN stage) still restores the weights
        sample = jnp.zeros((1, 4, 64, 64, 6))
        fresh = create_train_state(
            tiny_model(), jax.random.key(99), sample,
            tx=make_optimizer(1e-4, b1=0.5),
        )
        restored = mgr.restore_weights(fresh)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(trainer.state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        mgr.close()


def test_donating_no_schedule_run_drops_no_metric_keys(synth_root, tmp_path):
    """Donation guarantee: every buffered device-scalar metric — including
    the constant-lr hyperparam, whose buffer XLA aliases in place across
    donating steps — must survive to the JSONL flush. This is the
    regression test for the use-after-donate lr bug that only hardware
    caught in round 2: a donating step runs BETWEEN metric buffering and
    the flush (log_every=2), so any metric kept as a view into the donated
    train state would read back as 'Array has been deleted' and be dropped
    with a warning."""
    import json

    cfg = config_lib.Config(
        train=config_lib.TrainConfig(
            epochs=2,
            validate_at=10_000,
            checkpoint_dir=str(tmp_path / "ckpt_d"),
            sample_folder=str(tmp_path / "samples_d"),
        )
    )
    model = tiny_model()
    ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
    loader = DataLoader(ds, batch_clips=1, num_workers=2, seed=0)
    val_ds = TemporalAlignmentDataset(synth_root, "val", 4, resolution=64)
    val_loader = DataLoader(
        val_ds, batch_clips=1, shuffle=False, num_workers=2
    )
    sample = jnp.zeros((1, 4, 64, 64, 6))
    # constant lr (NO schedule): the aliasing case
    state = create_train_state(model, jax.random.key(0), sample, lr=1e-3)
    metrics_path = tmp_path / "metrics_donate.jsonl"
    trainer = Trainer(
        cfg, model, state, make_train_step(model, donate=True),
        make_eval_step(model), loader, val_loader, mesh=make_mesh(data=1),
        log_every=2, metrics_path=str(metrics_path),
    )
    trainer.fit(2)

    records = [
        json.loads(line) for line in metrics_path.read_text().splitlines()
    ]
    assert len(records) >= 4
    for r in records:
        for k in ("loss", "mse", "latent", "lr"):
            assert k in r, f"metric '{k}' dropped from record {r}"
            assert np.isfinite(r[k]), f"metric '{k}' not finite: {r}"
    # the writer never hit the unreadable-scalar fallback
    assert trainer.metrics_writer._warned == set()


def test_fit_saves_final_checkpoint_without_validation(synth_root, tmp_path):
    """A run shorter than the validation cadence must still checkpoint its
    final state (caught by the round-3 quality-run smoke: short runs saved
    NOTHING because only validate() ever called _save)."""
    from faceoff_tpu.io.checkpoint import CheckpointManager

    trainer = build_trainer(synth_root, tmp_path)  # validate_at=10_000
    trainer.fit(1)
    assert trainer.global_step > 0
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    restored = mgr.restore_weights(trainer.state)
    assert int(restored.step) == trainer.global_step


def test_checkpoint_resolution_transfer(tmp_path):
    """A checkpoint trained at one resolution restores and runs at another:
    the model is fully convolutional (conv kernels, 1x1 projections, and
    the VQ codebook are all resolution-independent), which is what makes
    training/serving beyond the reference's 256px hard cap possible
    (reference README.md:83, TemporalAlignment/dataset.py:230 fix 256)."""
    model = tiny_model()
    lo = jnp.zeros((1, 2, 32, 32, 6), jnp.float32)
    hi = jnp.zeros((1, 2, 64, 64, 6), jnp.float32)

    state = create_train_state(model, jax.random.key(0), lo, lr=1e-3)
    step = make_train_step(model, donate=False)
    batch = {
        "input": jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, lo.shape), jnp.float32
        ),
        "gt": jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, lo.shape[:-1] + (3,)),
            jnp.float32,
        ),
    }
    state, _ = step(state, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)

    # fresh state built at 2x the resolution: identical param tree
    hi_state = create_train_state(model, jax.random.key(1), hi, lr=1e-3)
    chex = jax.tree_util.tree_structure
    assert chex(hi_state.params) == chex(state.params)
    restored = mgr.restore_weights(hi_state)
    got = jax.tree_util.tree_leaves(restored.params)[0]
    want = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # and the restored weights run at the higher resolution
    dec, latent = model.apply(
        {"params": restored.params, "vq": restored.vq},
        jnp.asarray(
            np.random.default_rng(2).uniform(-1, 1, hi.shape), jnp.float32
        ),
        train=False,
    )
    assert dec.shape == hi.shape
    assert np.isfinite(float(latent))


def test_fit_budget_is_absolute_after_resume(synth_root, tmp_path):
    """fit(N) counts RESTORED progress toward the budget: a supervisor
    restart (--ckpt latest after a stall exit) finishes the original run
    instead of appending N fresh epochs (which also wrapped the
    step-indexed one-cycle schedule past its horizon)."""
    t1 = build_trainer(synth_root, tmp_path)
    t1.fit(1)
    spe = len(t1.train_loader)
    assert t1.global_step == spe

    t2 = build_trainer(synth_root, tmp_path)  # same checkpoint_dir
    t2.resume(None)
    assert t2.global_step == spe
    t2.fit(3)  # total budget 3 epochs, 1 already done
    assert t2.global_step == 3 * spe

    t3 = build_trainer(synth_root, tmp_path)
    t3.resume(None)
    t3.fit(3)  # budget already met: trains nothing, still saves nothing new
    assert t3.global_step == 3 * spe


def test_fit_budget_absolute_with_steps_per_call(tmp_path_factory, tmp_path):
    """Same absolute-budget guarantee when K>1 steps ride one dispatch:
    _batch_stream drops the remainder below a full K-stack, so each epoch
    advances global_step by floor(spe/K)*K — resume accounting must credit
    epochs against THAT effective length, not the raw loader length
    (otherwise a supervisor restart re-runs finished epochs and pushes the
    step-indexed schedule past its horizon)."""
    from faceoff_tpu.train.train_step import make_multi_step

    root = tmp_path_factory.mktemp("spc_synth")
    synthetic.generate_dataset(str(root), n_videos=3, n_frames=8, size=64)

    def build(epochs):
        cfg = config_lib.Config(
            train=config_lib.TrainConfig(
                epochs=epochs,
                validate_at=10_000,
                checkpoint_dir=str(tmp_path / "ckpt_spc"),
                sample_folder=str(tmp_path / "samples_spc"),
            )
        )
        model = tiny_model()
        ds = TemporalAlignmentDataset(str(root), "train", 4, resolution=64)
        loader = DataLoader(ds, batch_clips=1, num_workers=2, seed=0)
        val_ds = TemporalAlignmentDataset(str(root), "val", 4, resolution=64)
        val_loader = DataLoader(
            val_ds, batch_clips=1, shuffle=False, num_workers=2
        )
        sample = jnp.zeros((1, 4, 64, 64, 6))
        state = create_train_state(model, jax.random.key(0), sample, lr=1e-3)
        train_step = make_multi_step(model, 2, donate=False)
        eval_step = make_eval_step(model)
        mesh = make_mesh(data=1)
        return Trainer(
            cfg, model, state, train_step, eval_step, loader, val_loader,
            mesh=mesh, steps_per_call=2,
        )

    k = 2
    t1 = build(epochs=1)
    spe_raw = len(t1.train_loader)
    assert spe_raw == 3  # remainder case: 3 batches, K=2 -> 2 steps/epoch
    spe_eff = (spe_raw // k) * k
    t1.fit(1)
    assert t1.global_step == spe_eff

    t2 = build(epochs=3)
    t2.resume(None)
    assert t2.global_step == spe_eff
    t2.fit(3)  # total budget 3 epochs, 1 (effective-length) already done
    assert t2.global_step == 3 * spe_eff

    t3 = build(epochs=3)
    t3.resume(None)
    t3.fit(3)  # budget already met
    assert t3.global_step == 3 * spe_eff
