"""Discriminator shape/behaviour tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from faceoff_tpu.models.discriminators import (
    ActNorm,
    ImageDiscriminator,
    MultiscaleDiscriminator2D,
    MultiscaleDiscriminator3D,
    NLayerDiscriminator,
    PatchImageDiscriminator,
    PatchVideoDiscriminator,
    VideoDiscriminator,
)
from faceoff_tpu.losses import (
    bce_logits_loss,
    hinge_d_loss,
    lsgan_loss,
    multiscale_gan_loss,
    relativistic_average_lsgan,
)


class TestMultiscale2D:
    def test_scales_and_logit_shapes(self):
        d = MultiscaleDiscriminator2D(num_D=2, n_layers=3)
        x = jnp.zeros((2, 64, 64, 6))
        vars_ = d.init(jax.random.key(0), x)
        out = d.apply(vars_, x)
        assert len(out) == 2  # num_D scales
        for scale in out:
            assert len(scale) == 5  # n_layers + 2 feature taps
            assert scale[-1].shape[-1] == 1  # logit map

    def test_loss_composes(self):
        d = MultiscaleDiscriminator2D(num_D=2)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 6))
        y = jax.random.normal(jax.random.key(2), (1, 64, 64, 6))
        vars_ = d.init(jax.random.key(0), x)
        real, fake = d.apply(vars_, x), d.apply(vars_, y)
        for fn in (
            lambda: relativistic_average_lsgan(real, fake, True),
            lambda: lsgan_loss(real, True),
            lambda: hinge_d_loss(real, fake),
            lambda: bce_logits_loss(fake, False),
            lambda: multiscale_gan_loss("ralsgan", real, fake),
        ):
            v = fn()
            assert np.isfinite(float(v))


class TestMultiscale3D:
    def test_video_input(self):
        d = MultiscaleDiscriminator3D(num_D=2, n_layers=2)
        x = jnp.zeros((1, 8, 32, 32, 6))
        vars_ = d.init(jax.random.key(0), x)
        out = d.apply(vars_, x)
        assert len(out) == 2
        assert out[0][-1].shape[-1] == 1


class TestMocogan:
    def test_patch_image(self):
        d = PatchImageDiscriminator()
        x = jnp.zeros((2, 256, 256, 3))
        vars_ = d.init(jax.random.key(0), x, train=False)
        out = d.apply(vars_, x, train=False)
        assert out.shape == (2, 4, 4)

    def test_patch_video(self):
        d = PatchVideoDiscriminator()
        x = jnp.zeros((1, 10, 128, 128, 3))
        vars_ = d.init(jax.random.key(0), x, train=False)
        out = d.apply(vars_, x, train=False)
        assert out.shape[0] == 1 and out.ndim == 4

    def test_image_scalar(self):
        d = ImageDiscriminator()
        x = jnp.zeros((3, 256, 256, 3))
        vars_ = d.init(jax.random.key(0), x, train=False)
        out = d.apply(vars_, x, train=False)
        assert out.shape == (3,)

    def test_video_scalar(self):
        d = VideoDiscriminator()
        x = jnp.zeros((2, 16, 256, 256, 3))
        vars_ = d.init(jax.random.key(0), x, train=False)
        out = d.apply(vars_, x, train=False)
        assert out.shape == (2,)


class TestPatchGAN:
    def test_sigmoid_range(self):
        d = NLayerDiscriminator()
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        vars_ = d.init(jax.random.key(0), x, train=False)
        out = d.apply(vars_, x, train=False)
        assert float(out.min()) >= 0 and float(out.max()) <= 1

    def test_actnorm_data_dependent_init(self):
        an = ActNorm(4)
        x = jax.random.normal(jax.random.key(0), (8, 16, 16, 4)) * 3 + 2
        vars_ = an.init(jax.random.key(1), x, train=False)
        # initialized on that batch -> normalizes it to zero-mean unit-var
        out = an.apply(vars_, x)
        np.testing.assert_allclose(float(out.mean()), 0.0, atol=1e-4)
        np.testing.assert_allclose(float(out.std()), 1.0, atol=1e-2)
        # on other data the stored affine applies (not re-initialized)
        y = jax.random.normal(jax.random.key(2), (8, 16, 16, 4)) * 3 + 2
        out_y = an.apply(vars_, y)
        assert abs(float(out_y.mean())) < 0.2  # same distribution -> close
