"""Device-side input pipeline tests: contract parity with the host path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.data import synthetic
from faceoff_tpu.data.device_pipeline import (
    RawClipLoader,
    eye_centers_from_landmarks,
    prepare_train_batch,
)
from faceoff_tpu.data.dataset import TemporalAlignmentDataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("devpipe")
    synthetic.generate_dataset(str(root), n_videos=2, n_frames=8, size=64)
    return str(root)


class TestPrepare:
    def _batch(self, b=1, t=4, hw=64):
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (b, t, hw, hw, 3), np.uint8)
        lms = np.stack(
            [
                np.stack(
                    [synthetic.face_landmarks((hw / 2, hw / 2), hw * 0.3)
                     for _ in range(t)]
                )
                for _ in range(b)
            ]
        ).astype(np.float32)
        return frames, lms

    def test_contract(self):
        frames, lms = self._batch()
        out = prepare_train_batch(
            jax.random.key(0), jnp.asarray(frames), jnp.asarray(lms)
        )
        assert out["input"].shape == (1, 4, 64, 64, 6)
        assert out["gt"].shape == (1, 4, 64, 64, 3)
        i = np.asarray(out["input"])
        assert i.min() >= -1.001 and i.max() <= 1.001
        # gt is the normalized original
        np.testing.assert_allclose(
            np.asarray(out["gt"]),
            frames.astype(np.float32) / 127.5 - 1.0,
            atol=1e-5,
        )

    def test_source_background_disjoint(self):
        frames, lms = self._batch()
        out = prepare_train_batch(
            jax.random.key(1), jnp.asarray(frames), jnp.asarray(lms)
        )
        inp = np.asarray(out["input"])[0, 0]
        src_on = (inp[..., :3] > -0.98).any(-1)
        bg_on = (inp[..., 3:] > -0.98).any(-1)
        # the hull region is excluded from the background
        overlap = (src_on & bg_on).mean()
        assert overlap < 0.35

    def test_deterministic(self):
        frames, lms = self._batch()
        a = prepare_train_batch(
            jax.random.key(2), jnp.asarray(frames), jnp.asarray(lms)
        )
        b = prepare_train_batch(
            jax.random.key(2), jnp.asarray(frames), jnp.asarray(lms)
        )
        np.testing.assert_array_equal(
            np.asarray(a["input"]), np.asarray(b["input"])
        )

    def test_color_jitter_variants(self):
        frames, lms = self._batch()
        for mode in ("const", "random"):
            out = prepare_train_batch(
                jax.random.key(3), jnp.asarray(frames), jnp.asarray(lms),
                color_jitter=mode,
            )
            assert np.isfinite(np.asarray(out["input"])).all()

    def test_eye_centers(self):
        lms = synthetic.face_landmarks((32, 32), 20)
        c = eye_centers_from_landmarks(jnp.asarray(lms))
        assert abs(float(c[0]) - 32) < 3
        # eyes sit above face centre (smaller y)
        assert float(c[1]) < 32


class TestRawLoader:
    def test_batches(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
        loader = RawClipLoader(ds, batch_clips=2, num_workers=2)
        batch = next(iter(loader))
        assert batch["frames"].shape == (2, 4, 64, 64, 3)
        assert batch["frames"].dtype == np.uint8
        assert batch["landmarks"].shape == (2, 4, 68, 2)

    def test_feeds_prepare(self, synth_root):
        ds = TemporalAlignmentDataset(synth_root, "train", 4, resolution=64)
        loader = RawClipLoader(ds, batch_clips=1, num_workers=1)
        batch = next(iter(loader))
        out = prepare_train_batch(
            jax.random.key(0),
            jnp.asarray(batch["frames"]),
            jnp.asarray(batch["landmarks"]),
        )
        assert out["input"].shape == (1, 4, 64, 64, 6)
