"""Fréchet distance (FID/FVD-family) metric tests."""

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.evaluation import (
    feature_stats,
    fid,
    frechet_distance,
    make_fd_vgg,
    make_fd_video,
)


class TestFrechetDistance:
    def test_identical_gaussians_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 8)).astype(np.float32)
        d = float(fid(jnp.asarray(x), jnp.asarray(x)))
        assert abs(d) < 1e-3

    def test_analytic_diagonal_case(self):
        """For Gaussians with diagonal covariances the distance has the
        closed form |m1-m2|^2 + sum (sqrt(v1)-sqrt(v2))^2."""
        d_dim = 4
        mu1 = jnp.zeros(d_dim)
        mu2 = jnp.full((d_dim,), 2.0)
        v1 = jnp.array([1.0, 2.0, 3.0, 4.0])
        v2 = jnp.array([4.0, 3.0, 2.0, 1.0])
        got = float(
            frechet_distance(mu1, jnp.diag(v1), mu2, jnp.diag(v2))
        )
        want = float(
            jnp.sum((mu1 - mu2) ** 2)
            + jnp.sum((jnp.sqrt(v1) - jnp.sqrt(v2)) ** 2)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_monotone_in_mean_shift(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(400, 6)).astype(np.float32)
        near = x + 0.5
        far = x + 3.0
        d_near = float(fid(jnp.asarray(x), jnp.asarray(near)))
        d_far = float(fid(jnp.asarray(x), jnp.asarray(far)))
        assert d_near < d_far

    def test_feature_stats_shapes(self):
        mu, cov = feature_stats(jnp.ones((10, 5)))
        assert mu.shape == (5,) and cov.shape == (5, 5)


class TestFdVgg:
    def test_noise_level_ordering(self):
        """fd_vgg grows with corruption level — usable as a training-run
        quality tracker even with the random-VGG extractor."""
        from faceoff_tpu.models.lpips import init_lpips

        _, variables = init_lpips(jax.random.key(0), image_size=32)
        fd = make_fd_vgg(variables)
        rng = np.random.default_rng(2)
        real = jnp.asarray(
            rng.uniform(-1, 1, (24, 32, 32, 3)).astype(np.float32)
        )
        small = jnp.clip(real + 0.05 * rng.normal(size=real.shape), -1, 1)
        big = jnp.clip(real + 0.6 * rng.normal(size=real.shape), -1, 1)
        d_small = float(fd(real, small.astype(jnp.float32)))
        d_big = float(fd(real, big.astype(jnp.float32)))
        assert d_small < d_big
        assert np.isfinite(d_small) and np.isfinite(d_big)


class TestFdVideo:
    def test_motion_metric_detects_temporal_corruption(self):
        """Shuffling frames within each clip destroys temporal coherence
        but leaves every individual frame intact: fd_vgg_motion must move
        sharply while fd_vgg (per-frame appearance) stays near zero —
        the discrimination FVD provides over FID."""
        from faceoff_tpu.models.lpips import init_lpips

        _, variables = init_lpips(jax.random.key(0), image_size=32)
        fd = make_fd_video(variables)
        rng = np.random.default_rng(3)
        # smooth synthetic clips: drifting gradient + noise texture
        b, t, hw = 4, 8, 32
        base = rng.uniform(-0.5, 0.5, (b, 1, hw, hw, 3))
        drift = np.linspace(0, 0.4, t)[None, :, None, None, None]
        real = np.clip(
            base + drift + 0.02 * rng.normal(size=(b, t, hw, hw, 3)), -1, 1
        ).astype(np.float32)
        perm = rng.permutation(t)
        shuffled = real[:, perm]

        same = {k: float(v) for k, v in fd(jnp.asarray(real),
                                           jnp.asarray(real)).items()}
        # the eigh-based sqrtm has a ~0.01 numerical noise floor
        assert abs(same["fd_vgg"]) < 0.05
        assert abs(same["fd_vgg_motion"]) < 0.05

        shuf = {k: float(v) for k, v in fd(jnp.asarray(real),
                                           jnp.asarray(shuffled)).items()}
        # identical frame set -> appearance distance stays at noise level
        assert abs(shuf["fd_vgg"]) < 0.05
        # broken ordering -> motion distance far above the noise floor
        assert shuf["fd_vgg_motion"] > 0.2
        assert shuf["fd_vgg_motion"] > 10 * abs(shuf["fd_vgg"])


def test_multibatch_features_match_single_batch():
    """Accumulating per-batch features then computing stats once must equal
    computing the distance over all clips in one batch — the multi-batch
    validation path (cli/train_faceoff_gan.py) is exact, not an average of
    per-batch distances."""
    import jax

    from faceoff_tpu.evaluation import make_fd_video, make_fd_video_features
    from faceoff_tpu.models.lpips import init_lpips

    _, lpips_vars = init_lpips(jax.random.key(0), image_size=32)
    k1, k2 = jax.random.split(jax.random.key(1))
    real = jax.random.uniform(k1, (4, 3, 32, 32, 3), minval=-1, maxval=1)
    fake = jax.random.uniform(k2, (4, 3, 32, 32, 3), minval=-1, maxval=1)

    whole = make_fd_video(lpips_vars)(real, fake)
    feats, finalize = make_fd_video_features(lpips_vars)
    chunked = finalize([
        feats(real[:2], fake[:2]), feats(real[2:], fake[2:]),
    ])
    for k in ("fd_vgg", "fd_vgg_motion"):
        np.testing.assert_allclose(
            float(chunked[k]), float(whole[k]), rtol=1e-4
        )


def test_vgg_features_chunked_matches_unchunked():
    """Chunked frame processing (the OOM guard for high-res validation
    sets) is exact: same features as one full-batch pass."""
    import jax

    from faceoff_tpu.evaluation import vgg_features
    from faceoff_tpu.models.lpips import init_lpips

    _, lpips_vars = init_lpips(jax.random.key(0), image_size=32)
    imgs = jax.random.uniform(
        jax.random.key(3), (7, 32, 32, 3), minval=-1, maxval=1
    )
    whole = vgg_features(lpips_vars, imgs, chunk=7)
    chunked = vgg_features(lpips_vars, imgs, chunk=3)  # 3+3+1 split
    assert whole.shape == chunked.shape
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(whole), rtol=1e-5, atol=1e-6
    )
