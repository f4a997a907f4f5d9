"""Tests for auxiliary parity components: contrastive/siamese loss,
gradient penalty, cycle-anneal schedule, bb masks, exclusion lists,
noise layer, observability utilities."""

import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.losses.contrastive import (
    SiameseFaceEmbedder,
    contrastive_loss,
    pairwise_distance,
)
from faceoff_tpu.losses.gan import gradient_penalty
from faceoff_tpu.train import schedule as S


class TestContrastive:
    def test_similar_pairs_pulled(self):
        a = jnp.ones((4, 8))
        b = jnp.ones((4, 8)) * 1.1
        sim = contrastive_loss(a, b, jnp.zeros(4))
        dis = contrastive_loss(a, b, jnp.ones(4))
        assert float(sim) < float(dis)  # close pair: similar loss small

    def test_margin_zeroes_far_dissimilar(self):
        a = jnp.zeros((2, 4))
        b = jnp.ones((2, 4)) * 10
        dis = contrastive_loss(a, b, jnp.ones(2), margin=2.0)
        assert float(dis) == 0.0

    def test_siamese_forward(self):
        net = SiameseFaceEmbedder()
        x = jax.random.uniform(jax.random.key(0), (2, 64, 64))
        vars_ = net.init(jax.random.key(1), x, x, train=False)
        d = net.apply(vars_, x, x, train=False)
        # identical inputs -> distance is exactly sqrt(eps)=1e-3
        assert float(d) <= 1.1e-3
        y = jax.random.uniform(jax.random.key(2), (2, 64, 64))
        d2 = net.apply(vars_, x, y, train=False)
        assert float(d2) > float(d)


class TestGradientPenalty:
    def test_finite_and_positive(self):
        from faceoff_tpu.models.discriminators import MultiscaleDiscriminator2D

        d = MultiscaleDiscriminator2D(ndf=8, n_layers=2, num_D=2)
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 6))
        vars_ = d.init(jax.random.key(1), x)
        gp = gradient_penalty(
            lambda z: d.apply(vars_, z),
            x,
            x * 0.5,
            jax.random.key(2),
        )
        assert np.isfinite(float(gp))
        assert float(gp) >= 0


class TestCycleAnneal:
    def test_profile(self):
        fn = S.cycle_anneal(1e-3, 10.0, 20, 100)
        vals = [float(fn(i)) for i in range(100)]
        assert all(np.isfinite(vals))
        peak = int(np.argmax(vals))
        assert 30 <= peak <= 50  # ramps up then down
        assert vals[-1] < vals[peak] / 10


class TestBBMaskAndExclusion:
    def test_bounding_box_mask(self):
        from faceoff_tpu.data.geometry import bounding_box_mask

        pts = np.array([[10, 12], [30, 40]], np.float32)
        mask = bounding_box_mask((64, 64, 3), pts)
        assert mask[20, 20, 0] == 255
        assert mask[5, 5, 0] == 0

    def test_exclude_list(self, tmp_path):
        from faceoff_tpu.data import synthetic
        from faceoff_tpu.data.dataset import list_videos

        synthetic.generate_dataset(str(tmp_path), n_videos=3, n_frames=6, size=32)
        all_videos = list_videos(str(tmp_path))
        assert len(all_videos) == 3
        excl = tmp_path / "bad.json"
        excl.write_text(json.dumps(["video_001"]))
        kept = list_videos(str(tmp_path), exclude_list=str(excl))
        assert len(kept) == 2
        assert not any("video_001" in v for v in kept)

    def test_dataset_bb_mode(self, tmp_path):
        from faceoff_tpu.data import synthetic
        from faceoff_tpu.data.dataset import TemporalAlignmentDataset

        synthetic.generate_dataset(str(tmp_path), n_videos=1, n_frames=6, size=64)
        ds = TemporalAlignmentDataset(
            str(tmp_path), "train", 2, resolution=64, use_bb_mask=True
        )
        item = ds.get_item(0, np.random.default_rng(0))
        assert item["gt"].shape == (2, 64, 64, 3)


class TestNoiseLayer:
    def test_noise_changes_output_with_rng(self):
        from faceoff_tpu.models.discriminators import PatchImageDiscriminator

        d = PatchImageDiscriminator(ndf=8, use_noise=True)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = d.init(jax.random.key(0), x, train=False)
        a = d.apply(vars_, x, train=False)
        b = d.apply(
            vars_, x, train=True, rngs={"noise": jax.random.key(1)},
            mutable=["batch_stats"],
        )[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestObservability:
    def test_metrics_writer(self, tmp_path):
        from faceoff_tpu.train.observability import MetricsWriter

        path = str(tmp_path / "m.jsonl")
        w = MetricsWriter(path)
        w.write(1, {"loss": jnp.float32(0.5)}, epoch=0)
        w.write(2, {"loss": 0.25}, epoch=0)
        w.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
        assert lines[1]["loss"] == 0.25

    def test_preemption_guard(self):
        import os
        import signal

        from faceoff_tpu.train.observability import PreemptionGuard

        g = PreemptionGuard(signals=(signal.SIGUSR1,))
        assert not g.should_stop
        os.kill(os.getpid(), signal.SIGUSR1)
        assert g.should_stop
        g.restore()


class TestExcludeListCLIPlumbing:
    """--exclude_list must reach every dataset the CLIs construct (the
    reference consumes its curation lists inside the dataset class;
    here the list is an explicit flag, reference dataset.py:190-208)."""

    def _record(self, monkeypatch, module):
        calls = []
        real = module.TemporalAlignmentDataset

        def recorder(*a, **kw):
            calls.append(kw.get("exclude_list"))
            return real(*a, **kw)

        monkeypatch.setattr(module, "TemporalAlignmentDataset", recorder)
        return calls

    def test_perceptual_cli_threads_exclude_list(
        self, monkeypatch, tmp_path
    ):
        from faceoff_tpu.cli import train_faceoff_perceptual as cli
        from faceoff_tpu.data import synthetic

        root = tmp_path / "ds"
        synthetic.generate_dataset(str(root), n_videos=3, n_frames=6, size=32)
        excl = tmp_path / "bad.json"
        excl.write_text(json.dumps(["video_002"]))
        calls = self._record(monkeypatch, cli)
        cli.main([
            "--data_root", str(root), "--size", "32", "--epoch", "1",
            "--train_frames", "2", "--val_frames", "2",
            "--validate_at", "100000", "--num_workers", "1",
            "--exclude_list", str(excl),
            "--sample_folder", str(tmp_path / "s"),
            "--checkpoint_dir", str(tmp_path / "c"),
            "--channel", "16", "--n_res_block", "1", "--n_res_channel", "8",
            "--embed_dim", "8", "--n_embed", "32",
        ])
        # both the train and the val dataset got the list
        assert len(calls) == 2 and all(c == str(excl) for c in calls)

    def test_evaluate_parser_accepts_exclude_list(self):
        # parser-level check for the inference CLI (running evaluate
        # end-to-end needs a checkpoint; plumbing is one kwarg)
        import inspect

        from faceoff_tpu.cli import evaluate

        src = inspect.getsource(evaluate)
        assert "--exclude_list" in src or "add_curation_flags" in src
        assert "exclude_list=args.exclude_list" in src


class TestStallWatchdog:
    """Fail-fast guard against a hung accelerator client
    (train/observability.StallWatchdog)."""

    def test_fires_after_timeout_without_beats(self):
        import threading

        from faceoff_tpu.train.observability import StallWatchdog

        fired = threading.Event()
        wd = StallWatchdog(
            timeout=0.15, on_stall=lambda idle: fired.set(),
            poll_interval=0.02,
        )
        assert fired.wait(2.0), "watchdog never fired"
        wd.stop()

    def test_beats_keep_it_alive_and_stop_disarms(self):
        import threading
        import time as _t

        from faceoff_tpu.train.observability import StallWatchdog

        fired = threading.Event()
        wd = StallWatchdog(
            timeout=0.3, on_stall=lambda idle: fired.set(),
            poll_interval=0.02,
        )
        for _ in range(5):  # heartbeat faster than the timeout
            _t.sleep(0.1)
            wd.beat()
        assert not fired.is_set()
        wd.stop()
        _t.sleep(0.5)  # disarmed: no firing even after the timeout passes
        assert not fired.is_set()

    def test_zero_timeout_disabled(self):
        from faceoff_tpu.train.observability import StallWatchdog

        wd = StallWatchdog(timeout=0.0)
        assert not wd._thread.is_alive()
        wd.beat()
        wd.stop()
