"""Device-resident corpus: staging, on-device clip sampling, fused
training, and the CLI surface (--resident_data)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.data import synthetic
from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.resident import (
    ResidentBatches,
    build_resident_corpus,
    make_resident_prepare,
    sample_clip_windows,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("resident_ds")
    synthetic.generate_dataset(str(root), n_videos=3, n_frames=10, size=64)
    return str(root)


@pytest.fixture(scope="module")
def corpus(synth_root):
    ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
    return build_resident_corpus(ds)


class TestCorpus:
    def test_staging_matches_disk(self, synth_root, corpus):
        from faceoff_tpu.data.dataset import (
            _landmark_paths,
            load_window_frames,
        )

        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
        assert corpus.n_videos == len(ds.videos) == 3
        assert corpus.frames.dtype == jnp.uint8
        paths = _landmark_paths(ds.videos[1])
        want_f, want_l = load_window_frames(paths, 64)
        n = int(corpus.n_frames[1])
        assert n == len(paths)
        np.testing.assert_array_equal(
            np.asarray(corpus.frames[1, :n]), want_f
        )
        np.testing.assert_allclose(
            np.asarray(corpus.landmarks[1, :n]), want_l
        )

    def test_hbm_budget_guard(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
        with pytest.raises(MemoryError):
            build_resident_corpus(ds, hbm_budget_bytes=1024)

    def test_max_frames_cap(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
        c = build_resident_corpus(ds, max_frames_per_video=5)
        assert c.frames.shape[1] == 5
        assert int(jnp.max(c.n_frames)) == 5


class TestSampling:
    def test_windows_are_corpus_rows(self, corpus):
        clips, lms = jax.jit(
            lambda k: sample_clip_windows(
                k, corpus.frames, corpus.landmarks, corpus.n_frames, 8, 4
            )
        )(jax.random.key(0))
        assert clips.shape == (8, 4, 64, 64, 3)
        assert lms.shape == (8, 4, 68, 2)
        clips = np.asarray(clips)
        frames = np.asarray(corpus.frames)
        # every sampled clip must be a contiguous window of some video
        for b in range(8):
            found = False
            for v in range(corpus.n_videos):
                n = int(corpus.n_frames[v])
                for s in range(max(1, n - 4 + 1)):
                    if np.array_equal(clips[b], frames[v, s:s + 4]):
                        found = True
            assert found, f"clip {b} is not a corpus window"

    def test_short_video_repeats_last_frame(self, corpus):
        # request clips longer than any video: every clip must end in
        # repeats of its video's final frame (dataset _sample_window policy)
        t = int(corpus.frames.shape[1]) + 3
        clips, _ = sample_clip_windows(
            jax.random.key(1), corpus.frames, corpus.landmarks,
            corpus.n_frames, 4, t,
        )
        clips = np.asarray(clips)
        for b in range(4):
            np.testing.assert_array_equal(clips[b, -1], clips[b, -2])
            np.testing.assert_array_equal(clips[b, -2], clips[b, -3])

    def test_distinct_keys_sample_distinct_clips(self, corpus):
        a, _ = sample_clip_windows(
            jax.random.key(2), corpus.frames, corpus.landmarks,
            corpus.n_frames, 8, 4,
        )
        b, _ = sample_clip_windows(
            jax.random.key(3), corpus.frames, corpus.landmarks,
            corpus.n_frames, 8, 4,
        )
        assert not np.array_equal(np.asarray(a), np.asarray(b))


class TestPrepare:
    def test_batch_contract(self, corpus):
        prepare = make_resident_prepare(corpus, 2, 4)
        batch = jax.jit(prepare)(
            jax.random.key(0), corpus.frames, corpus.landmarks
        )
        assert batch["input"].shape == (2, 4, 64, 64, 6)
        assert batch["gt"].shape == (2, 4, 64, 64, 3)
        assert float(jnp.max(batch["gt"])) <= 1.0 + 1e-5
        assert float(jnp.min(batch["gt"])) >= -1.0 - 1e-5

    def test_mesh_constraint_shards_batch_over_data(self, corpus, devices):
        """With mesh= given, the sampled batch must come out sharded
        P('data') — NOT inherit the corpus's replicated sharding (which
        would make every chip compute the full global batch and silently
        lose all data-parallel scaling)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from faceoff_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=8, devices=devices)
        replicated = NamedSharding(mesh, P())
        frames = jax.device_put(corpus.frames, replicated)
        lms = jax.device_put(corpus.landmarks, replicated)
        prepare = make_resident_prepare(corpus, 8, 4, mesh=mesh)
        batch = jax.jit(prepare)(jax.random.key(0), frames, lms)
        want = NamedSharding(mesh, P("data"))
        for k in ("input", "gt"):
            got = batch[k].sharding
            assert got.is_equivalent_to(want, batch[k].ndim), (
                f"{k} sharding {got} is not P('data') over the mesh"
            )
            # per-shard batch slice is 1 of 8 clips
            assert batch[k].addressable_shards[0].data.shape[0] == 1

    def test_fused_train_steps_advance(self, corpus):
        from faceoff_tpu.models import VQVAE
        from faceoff_tpu.train import create_train_state, make_train_step

        model = VQVAE(
            in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
            embed_dim=8, n_embed=32, dtype=jnp.float32,
        )
        prepare = make_resident_prepare(corpus, 2, 4)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((2, 4, 64, 64, 6)), lr=1e-3
        )
        step = make_train_step(model, prepare_fn=prepare, donate=False)
        batch = {"frames": corpus.frames, "landmarks": corpus.landmarks}
        key = jax.random.key(7)
        losses = []
        for _ in range(3):
            state, m = step(state, batch, None, key)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(l) for l in losses)
        # the SAME host key must still see fresh clips each step (the step
        # folds the on-device counter): consecutive losses differ
        assert len(set(losses)) > 1

    def test_constant_batch_multi_step(self, corpus):
        from faceoff_tpu.models import VQVAE
        from faceoff_tpu.train import create_train_state
        from faceoff_tpu.train.train_step import make_multi_step

        model = VQVAE(
            in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
            embed_dim=8, n_embed=32, dtype=jnp.float32,
        )
        prepare = make_resident_prepare(corpus, 2, 4)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((2, 4, 64, 64, 6)), lr=1e-3
        )
        multi = make_multi_step(
            model, 3, prepare_fn=prepare, donate=False, scan_batches=False
        )
        batch = {"frames": corpus.frames, "landmarks": corpus.landmarks}
        keys = jax.random.split(jax.random.key(1), 3)
        state, m = multi(state, batch, None, keys)
        assert int(state.step) == 3
        assert np.isfinite(float(m["loss_mean"]))


class TestResidentBatches:
    def test_len_and_iteration(self, corpus):
        rb = ResidentBatches(
            corpus, steps_per_epoch=5, steps_per_call=2,
            clips_per_step=2, clip_len=4,
        )
        # len() reports exactly the optimizer steps iteration delivers:
        # floor(5/2) dispatches x 2 steps each
        assert len(rb) == 4
        batches = list(rb)
        assert len(batches) == 2
        assert batches[0]["frames"] is corpus.frames

    def test_tiny_corpus_still_dispatches(self, corpus):
        # steps_per_epoch < steps_per_call (a tiny corpus on a wide mesh)
        # must still train one dispatch per epoch, not silently zero
        rb = ResidentBatches(
            corpus, steps_per_epoch=1, steps_per_call=4,
            clips_per_step=1, clip_len=4,
        )
        assert len(rb) == 4
        assert len(list(rb)) == 1


class TestResidentCLI:
    def test_train_resident_and_resume(self, synth_root, tmp_path):
        from faceoff_tpu.cli.train_faceoff_perceptual import main

        flags = [
            "--data_root", synth_root, "--size", "64", "--epoch", "2",
            "--train_frames", "2", "--val_frames", "2",
            "--validate_at", "100000", "--num_workers", "1",
            "--resident_data", "--sched", "cycle",
            "--metrics_path", str(tmp_path / "m.jsonl"),
            "--sample_folder", str(tmp_path / "s"),
            "--checkpoint_dir", str(tmp_path / "c"),
            "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
            "--embed_dim", "8", "--n_embed", "32",
        ]
        main(flags)
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert len(lines) >= 1
        assert np.isfinite(lines[-1]["loss"])

    def test_resident_steps_per_call(self, synth_root, tmp_path):
        from faceoff_tpu.cli.train_faceoff_perceptual import main

        main([
            "--data_root", synth_root, "--size", "64", "--epoch", "2",
            "--train_frames", "2", "--val_frames", "2",
            "--validate_at", "100000", "--num_workers", "1",
            "--resident_data", "--steps_per_call", "2",
            "--metrics_path", str(tmp_path / "m2.jsonl"),
            "--sample_folder", str(tmp_path / "s2"),
            "--checkpoint_dir", str(tmp_path / "c2"),
            "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
            "--embed_dim", "8", "--n_embed", "32",
        ])
        lines = [json.loads(l) for l in open(tmp_path / "m2.jsonl")]
        assert len(lines) >= 2
        assert np.isfinite(lines[-1]["loss"])

    def test_gan_resident_smoke(self, synth_root, tmp_path):
        from faceoff_tpu.cli.train_faceoff_gan import main

        main([
            "--data_root", synth_root, "--gan", "mocoganhd",
            "--size", "64", "--train_frames", "6", "--sample_frames", "4",
            "--val_frames", "4", "--validate_at", "100000",
            "--num_workers", "1", "--log_every", "1", "--batch_size", "1",
            "--steps", "2", "--resident_data",
            "--checkpoint_dir", str(tmp_path / "gc"),
            "--sample_folder", str(tmp_path / "gs"),
            "--metrics_path", str(tmp_path / "gm.jsonl"),
            "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
            "--embed_dim", "8", "--n_embed", "32", "--ndf", "8",
        ])
        lines = [json.loads(l) for l in open(tmp_path / "gm.jsonl")]
        assert any("g_loss" in l and np.isfinite(l["g_loss"]) for l in lines)
        assert any("d_3d_loss" in l for l in lines)

    @pytest.mark.parametrize("recipe", ["mocogan", "vqgan"])
    def test_gan_resident_other_recipes(self, synth_root, tmp_path, recipe):
        """--resident_data is not mocoganhd-only: the BCE mocogan and the
        adaptive-weight vqgan recipes take the same fused prepare_fn."""
        from faceoff_tpu.cli.train_faceoff_gan import main

        # train_frames 16: the patch VIDEO discriminator's stride-2 3D
        # stack collapses T<8 to an empty time axis (nan loss) — 16 is
        # the reference's window (mocogan trainers)
        main([
            "--data_root", synth_root, "--gan", recipe,
            "--size", "64", "--train_frames", "16", "--sample_frames", "4",
            "--val_frames", "4", "--validate_at", "100000",
            "--num_workers", "1", "--log_every", "1", "--batch_size", "1",
            "--steps", "2", "--resident_data",
            "--checkpoint_dir", str(tmp_path / f"gc_{recipe}"),
            "--sample_folder", str(tmp_path / f"gs_{recipe}"),
            "--metrics_path", str(tmp_path / f"gm_{recipe}.jsonl"),
            "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
            "--embed_dim", "8", "--n_embed", "32", "--ndf", "8",
        ])
        lines = [
            json.loads(l) for l in open(tmp_path / f"gm_{recipe}.jsonl")
        ]
        assert lines, "no metrics written"
        assert any(
            "g_loss" in l and np.isfinite(l["g_loss"]) for l in lines
        ), f"no finite g_loss in {lines}"

    def test_hbm_budget_flag_refuses_oversized_corpus(
        self, synth_root, tmp_path
    ):
        """--resident_hbm_budget_gib is the operator's HBM guard: an
        estimate above it must refuse BEFORE staging, naming the fallback."""
        from faceoff_tpu.cli.train_faceoff_perceptual import main

        with pytest.raises(MemoryError, match="device_pipeline"):
            main([
                "--data_root", synth_root, "--size", "64", "--epoch", "1",
                "--train_frames", "2", "--val_frames", "2",
                "--validate_at", "100000", "--num_workers", "1",
                "--resident_data",
                "--resident_hbm_budget_gib", "0.0001",
                "--checkpoint_dir", str(tmp_path / "c"),
                "--sample_folder", str(tmp_path / "s"),
                "--channel", "16", "--n_res_block", "1",
                "--n_res_channel", "8", "--embed_dim", "8",
                "--n_embed", "32",
            ])
