"""Quality metric tests: PSNR/SSIM axioms and golden behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.evaluation import evaluate_reconstruction, psnr, ssim


class TestPSNR:
    def test_identical_is_huge(self):
        x = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3), minval=-1)
        assert float(psnr(x, x)) > 100

    def test_known_value(self):
        x = jnp.zeros((1, 16, 16, 1))
        y = jnp.full((1, 16, 16, 1), 0.2)  # mse = 0.04, range 2 -> 20dB
        np.testing.assert_allclose(float(psnr(x, y)), 20.0, atol=1e-3)

    def test_monotone_in_noise(self):
        x = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3), minval=-1)
        n = jax.random.normal(jax.random.key(1), x.shape)
        assert float(psnr(x, x + 0.01 * n)) > float(psnr(x, x + 0.1 * n))


class TestSSIM:
    def test_identical_is_one(self):
        x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3), minval=-1)
        np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)

    def test_uncorrelated_is_low(self):
        x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3), minval=-1)
        y = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3), minval=-1)
        assert float(ssim(x, y)) < 0.2

    def test_noise_ordering(self):
        x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3), minval=-1)
        n = jax.random.normal(jax.random.key(1), x.shape)
        assert float(ssim(x, x + 0.02 * n)) > float(ssim(x, x + 0.2 * n))


class TestEvaluate:
    def test_report_keys_and_video_input(self):
        x = jax.random.uniform(jax.random.key(0), (1, 3, 32, 32, 3), minval=-1)
        y = x * 0.9
        rep = evaluate_reconstruction(x, y)
        assert set(rep) == {"mse", "l1", "psnr", "ssim"}
        for v in rep.values():
            assert np.isfinite(float(v))

    def test_with_lpips(self):
        from faceoff_tpu.models.lpips import init_lpips

        model, vars_ = init_lpips(jax.random.key(0), image_size=32)
        x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), minval=-1)
        rep = evaluate_reconstruction(
            x, x * 0.8, lpips_apply=lambda v, a, b: model.apply(v, a, b),
            lpips_vars=vars_,
        )
        assert "lpips" in rep and np.isfinite(float(rep["lpips"]))
