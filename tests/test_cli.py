"""CLI smoke tests: the argparse entry points run end-to-end in-process
with tiny models on synthetic data."""

import json
from glob import glob

import numpy as np
import pytest

from faceoff_tpu.data import synthetic

TINY_MODEL_FLAGS = [
    "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
    "--embed_dim", "8", "--n_embed", "32",
]


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ds")
    synthetic.generate_dataset(str(root), n_videos=2, n_frames=10, size=64)
    return str(root)


class TestPerceptualCLI:
    def test_train_one_epoch(self, synth_root, tmp_path):
        from faceoff_tpu.cli.train_faceoff_perceptual import main

        main([
            "--data_root", synth_root, "--size", "64", "--epoch", "1",
            "--train_frames", "2", "--val_frames", "2",
            "--validate_at", "100000", "--num_workers", "1",
            "--metrics_path", str(tmp_path / "m.jsonl"),
            "--sample_folder", str(tmp_path / "s"),
            "--checkpoint_dir", str(tmp_path / "c"),
            *TINY_MODEL_FLAGS,
        ])
        # under the 8-virtual-device test mesh the loader batches
        # batch_size x n_devices clips per step -> 1 step per epoch here
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert len(lines) >= 1
        assert np.isfinite(lines[-1]["loss"])

    def test_test_mode_writes_streams(self, synth_root, tmp_path):
        from faceoff_tpu.cli.train_faceoff_perceptual import main

        main([
            "--data_root", synth_root, "--size", "64",
            "--train_frames", "2", "--val_frames", "2",
            "--num_workers", "1", "--test",
            "--sample_folder", str(tmp_path / "s"),
            "--checkpoint_dir", str(tmp_path / "c"),
            *TINY_MODEL_FLAGS,
        ])
        vids = glob(str(tmp_path) + "/s_*/*.mp4")
        assert len(vids) >= 4


GAN_TINY_FLAGS = TINY_MODEL_FLAGS + ["--ndf", "8"]


class TestGANCLI:
    def test_sharded_train_and_exact_resume(self, synth_root, tmp_path):
        """The GAN loop shards batches over the 8-device test mesh, writes
        JSONL metrics + validation mp4 streams, checkpoints the FULL
        adversarial state, and --resume continues from it exactly."""
        from faceoff_tpu.cli.train_faceoff_gan import main

        args = [
            "--data_root", synth_root, "--gan", "mocoganhd",
            "--size", "64", "--train_frames", "6", "--sample_frames", "4",
            "--val_frames", "4", "--val_batches", "1",
            "--num_workers", "1", "--log_every", "1", "--batch_size", "1",
            "--checkpoint_dir", str(tmp_path / "c"),
            "--sample_folder", str(tmp_path / "s"),
            "--metrics_path", str(tmp_path / "m.jsonl"),
            *GAN_TINY_FLAGS,
        ]
        main(args + ["--steps", "2", "--validate_at", "2"])
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert any("g_loss" in l for l in lines)
        assert any("d_3d_loss" in l for l in lines)
        assert glob(str(tmp_path / "s") + "/*.mp4")
        # disc bundle checkpointed next to the generator
        assert glob(str(tmp_path / "c" / "disc") + "/*")

        main(args + ["--resume", "latest", "--steps", "4",
                     "--validate_at", "100000"])
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert lines[-1]["step"] == 4  # continued, not restarted

    def test_steps_per_call_scan(self, synth_root, tmp_path):
        """--steps_per_call 2: two alternating gen/disc iterations ride
        one lax.scan dispatch; metrics for both substeps land in the
        JSONL with the right key sets."""
        from faceoff_tpu.cli.train_faceoff_gan import main

        main([
            "--data_root", synth_root, "--gan", "mocoganhd",
            "--size", "64", "--train_frames", "6", "--sample_frames", "4",
            "--val_frames", "4", "--validate_at", "100000",
            "--num_workers", "1", "--log_every", "2", "--batch_size", "1",
            "--steps", "4", "--steps_per_call", "2",
            "--checkpoint_dir", str(tmp_path / "c"),
            "--sample_folder", str(tmp_path / "s"),
            "--metrics_path", str(tmp_path / "m.jsonl"),
            *GAN_TINY_FLAGS,
        ])
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        gen_lines = [l for l in lines if "g_loss" in l]
        disc_lines = [l for l in lines if "d_3d_loss" in l]
        assert len(gen_lines) == 2 and len(disc_lines) == 2
        assert all(np.isfinite(l["g_loss"]) for l in gen_lines)
        # gen on odd output steps (1,3), disc on even (2,4)
        assert sorted(l["step"] for l in gen_lines) == [1, 3]
        assert sorted(l["step"] for l in disc_lines) == [2, 4]

    def test_resume_continues_ramp_and_alternation(self, synth_root,
                                                   tmp_path):
        """A --resume latest retry mid---adversarial_ramp continues the
        ramp weight, the gen/disc alternation, and the step count from
        step0 EXACTLY — none of them may restart (the schedule-continuity
        guarantee the perceptual trainer got for its lr cycle)."""
        from faceoff_tpu.cli.train_faceoff_gan import main
        from faceoff_tpu.train.gan import adv_scale_schedule

        args = [
            "--data_root", synth_root, "--gan", "mocoganhd",
            "--size", "64", "--train_frames", "6", "--sample_frames", "4",
            "--val_frames", "4", "--validate_at", "100000",
            "--num_workers", "1", "--log_every", "1", "--batch_size", "1",
            "--adversarial_start", "2", "--adversarial_ramp", "4",
            "--checkpoint_dir", str(tmp_path / "c"),
            "--sample_folder", str(tmp_path / "s"),
            "--metrics_path", str(tmp_path / "m.jsonl"),
            *GAN_TINY_FLAGS,
        ]
        main(args + ["--steps", "4"])
        main(args + ["--resume", "latest", "--steps", "8"])
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        gen_lines = [l for l in lines if "g_loss" in l]
        disc_lines = [l for l in lines if "d_3d_loss" in l]
        # alternation continues across the resume: gen on odd output
        # steps, disc on even, with no step re-run or skipped
        assert sorted(l["step"] for l in gen_lines) == [1, 3, 5, 7]
        assert sorted(l["step"] for l in disc_lines) == [2, 4, 6, 8]
        # ramp weight is the absolute-step schedule on both sides of the
        # resume (gen at output step s ran with step_count = s - 1)
        for l in gen_lines:
            want = adv_scale_schedule(l["step"] - 1, start=2, ramp=4)
            assert l["adv_scale"] == pytest.approx(want)
        # and it must actually traverse the ramp, not restart at 0
        post = [l["adv_scale"] for l in sorted(
            gen_lines, key=lambda x: x["step"]
        )]
        assert post[-1] == 1.0 and post[0] == 0.0

    @pytest.mark.parametrize("recipe", ["mocogan", "vqgan"])
    def test_other_recipes_smoke(self, synth_root, tmp_path, recipe):
        from faceoff_tpu.cli.train_faceoff_gan import main

        main([
            "--data_root", synth_root, "--gan", recipe,
            "--size", "64", "--train_frames", "6", "--steps", "2",
            "--val_frames", "4", "--validate_at", "100000",
            "--num_workers", "1", "--log_every", "2", "--batch_size", "1",
            "--checkpoint_dir", str(tmp_path / "c"),
            "--sample_folder", str(tmp_path / "s"),
            *GAN_TINY_FLAGS,
        ])
        assert glob(str(tmp_path / "c" / "disc") + "/*")


class TestAlignmentCLI:
    def test_train_smoke(self, synth_root, tmp_path):
        """The alignment-regression trainer runs end-to-end: dataset
        alignment mode -> AlignmentNet -> MSE step -> metrics +
        checkpoint."""
        from faceoff_tpu.cli.train_alignment import main

        main([
            "--data_root", synth_root, "--size", "64", "--frames", "2",
            "--steps", "2", "--log_every", "1", "--num_workers", "1",
            "--widths", "8", "16",
            "--checkpoint_dir", str(tmp_path / "c"),
            "--metrics_path", str(tmp_path / "m.jsonl"),
        ])
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert lines and np.isfinite(lines[-1]["loss"])
        assert np.isfinite(lines[-1]["mae_rotation"])
        assert glob(str(tmp_path / "c") + "/*")


class TestSwapCLI:
    def test_streaming_matches_chunked(self, synth_root, tmp_path):
        """The swap CLI's online (--streaming) and chunked paths produce
        the same video from the same checkpoint, and model-size flags let
        non-default checkpoints load."""
        import jax
        import jax.numpy as jnp

        from faceoff_tpu.cli.swap import main as swap_main
        from faceoff_tpu.io.checkpoint import CheckpointManager
        from faceoff_tpu.io.video import read_video_frames
        from faceoff_tpu.models import VQVAE
        from faceoff_tpu.train import create_train_state

        model = VQVAE(
            in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
            embed_dim=8, n_embed=32, dtype=jnp.float32, use_pallas=False,
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 2, 64, 64, 6))
        )
        mgr = CheckpointManager(str(tmp_path / "c"))
        mgr.save(0, state)
        mgr.close()

        src = synth_root + "/video_000"
        tgt = synth_root + "/video_001"
        base = [
            "--source", src, "--target", tgt,
            "--checkpoint_dir", str(tmp_path / "c"),
            "--size", "64", "--chunk", "4", "--max_frames", "6",
            *TINY_MODEL_FLAGS,
        ]
        swap_main(base + ["--out", str(tmp_path / "chunked.mp4")])
        swap_main(
            base + ["--streaming", "--out", str(tmp_path / "stream.mp4")]
        )
        a = np.stack(read_video_frames(str(tmp_path / "chunked.mp4")))
        b = np.stack(read_video_frames(str(tmp_path / "stream.mp4")))
        assert a.shape == b.shape and a.shape[0] == 6
        # identical numerics; residual differences are codec noise
        assert np.mean(np.abs(a.astype(np.float32) - b.astype(np.float32))) < 2.0

        # --blend poisson is reachable end to end and writes the
        # Laplacian-blended naive baseline stream (reference
        # face_translation_videos3_utils.py:79-82)
        swap_main(
            base + ["--blend", "poisson", "--poisson_iters", "16",
                    "--save_streams",
                    "--out", str(tmp_path / "pblend.mp4")]
        )
        naive = np.stack(
            read_video_frames(str(tmp_path / "pblend_naive_poisson.mp4"))
        )
        assert naive.shape[0] == 6


class TestEvaluateCLI:
    def test_selfsupervised_and_crossid(self, synth_root, tmp_path, capsys):
        """evaluate: reconstruction metrics on the self-supervised val
        items; Fréchet distances (appearance + motion) in --crossid mode
        where swapped clips have no pixel ground truth."""
        import jax
        import jax.numpy as jnp

        from faceoff_tpu.cli.evaluate import main as eval_main
        from faceoff_tpu.io.checkpoint import CheckpointManager
        from faceoff_tpu.models import VQVAE
        from faceoff_tpu.train import create_train_state

        model = VQVAE(
            in_channels=6, channel=16, n_res_block=1, n_res_channel=8,
            embed_dim=8, n_embed=32, dtype=jnp.float32, use_pallas=False,
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 2, 64, 64, 6))
        )
        mgr = CheckpointManager(str(tmp_path / "c"))
        mgr.save(0, state)
        mgr.close()

        base = [
            "--data_root", synth_root,
            "--checkpoint_dir", str(tmp_path / "c"),
            "--size", "64", "--frames", "2", "--max_batches", "2",
            "--num_workers", "1", *TINY_MODEL_FLAGS,
        ]
        eval_main(base)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rep = json.loads(out)
        assert np.isfinite(rep["mse"]) and np.isfinite(rep["psnr"])
        assert "lpips_random_vgg" in rep  # honest key without real weights

        eval_main(base + ["--crossid"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rep = json.loads(out)
        assert np.isfinite(rep["fd_vgg_random_vgg"])
        assert np.isfinite(rep["fd_vgg_motion_random_vgg"])


class TestPreprocessCLI:
    def test_all_stages(self, tmp_path):
        from faceoff_tpu.cli.preprocess import main
        from faceoff_tpu.io.video import save_frames_as_video

        raw = tmp_path / "raw"
        raw.mkdir()
        frames = []
        for f in range(30):
            img = np.full((120, 120, 3), 40, np.uint8)
            lms = synthetic.face_landmarks((60, 60), 28)
            synthetic.draw_face(img, lms, (205, 165, 135))
            frames.append(img)
        save_frames_as_video(frames, str(raw / "v.mp4"), fps=25)

        main([
            "all", "--videos", str(raw), "--out", str(tmp_path / "clips"),
            "--resolution", "64", "--min_frames", "10",
        ])
        assert glob(str(tmp_path / "clips") + "/v/*/*_landmarks.npz")
