"""Discriminator family for the GAN fine-tuning stage.

Covers every discriminator the reference trainers use, re-built channels-
last in Flax:

  * `MultiscaleDiscriminator2D`/`3D` — the MoCoGAN-HD content and motion
    discriminators: num_D pyramid scales, each an N-layer k4 conv stack with
    InstanceNorm and LeakyReLU, returning intermediate features per scale
    (reference TemporalAlignment/models/mocoganhd_content_disc.py:49-165 and
    mocoganhd_video_disc.py:55-176, wrapped by ModelD_img :8-24 /
    ModelD_3d :8-30).
  * `PatchImageDiscriminator` / `PatchVideoDiscriminator` /
    `ImageDiscriminator` / `VideoDiscriminator` — the MoCoGAN BCE variants
    (reference TemporalAlignment/models/mocogan_discriminator.py:29-205).
  * `NLayerDiscriminator` — the Pix2Pix PatchGAN with optional ActNorm used
    by VQLPIPSWithDiscriminator (reference models/discriminator.py:17-67).

Conventions: images (N, H, W, C); videos (N, T, H, W, C) — the reference's
NCTHW transposes (e.g. train_vqvae_mocoganhd_disc_single.py:219) disappear.
Weight init follows the reference's normal(0, 0.02)
(mocoganhd_video_disc.py:33-39).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.normal(stddev=0.02)


class ActNorm(nn.Module):
    """Activation normalization with data-dependent initialization
    (reference models/actnorm.py:10-92): loc/scale are parameters whose
    *initial* values normalize the first batch to zero-mean unit-variance
    per channel. Initialize the module with a representative batch
    (`module.init(key, real_batch)`) — the JAX equivalent of the torch
    version's first-forward buffer mutation; thereafter they train by
    gradient like any parameter."""

    num_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        axes = tuple(range(x.ndim - 1))
        xs = jax.lax.stop_gradient(x)
        loc = self.param("loc", lambda key: -jnp.mean(xs, axis=axes))
        scale = self.param(
            "scale", lambda key: 1.0 / (jnp.std(xs, axis=axes) + 1e-6)
        )
        return scale * (x + loc)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims, no affine
    (reference mocoganhd InstanceNorm3d(affine=False))."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


def _norm(kind: str, features: int):
    if kind == "instance":
        return InstanceNorm()
    if kind == "batch":
        return nn.BatchNorm(use_running_average=True)
    if kind == "actnorm":
        return ActNorm(features)
    raise ValueError(f"unknown norm '{kind}'")


class _NLayerStack(nn.Module):
    """Shared N-layer k4 conv trunk, 2D or 3D by `ndim`
    (reference mocoganhd_video_disc.py:119-176). Returns all intermediate
    activations; the last is the logit map."""

    ndf: int
    n_layers: int
    ndim: int  # 2 or 3 spatial dims
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        k = (4,) * self.ndim
        feats = []
        x = nn.Conv(
            self.ndf, k, strides=2, padding=2 // 1, kernel_init=conv_init
        )(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        nf = self.ndf
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            x = nn.Conv(nf, k, strides=2, padding=2 // 1, kernel_init=conv_init)(x)
            x = _norm(self.norm, nf)(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        nf = min(nf * 2, 512)
        x = nn.Conv(nf, k, strides=1, padding=2 // 1, kernel_init=conv_init)(x)
        x = _norm(self.norm, nf)(x)
        x = nn.leaky_relu(x, 0.2)
        feats.append(x)
        x = nn.Conv(1, k, strides=1, padding=2 // 1, kernel_init=conv_init)(x)
        feats.append(x)
        return feats


def _avg_pool_nd(x: jnp.ndarray, ndim: int, strides: Tuple[int, ...]):
    window = (3,) * ndim
    return nn.avg_pool(
        x, window, strides=strides, padding=[(1, 1)] * ndim,
        count_include_pad=False,
    )


class MultiscaleDiscriminator2D(nn.Module):
    """MoCoGAN-HD content discriminator over concatenated frame pairs
    (reference mocoganhd_content_disc.py + ModelD_img; input nc doubled by
    the frame-pair concat at train_vqvae_mocoganhd_disc_single.py:201-205).

    __call__(x: (N, H, W, C)) -> list over num_D scales of feature lists.
    """

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        results = []
        for i in range(self.num_D):
            # larger ndf on the most-downsampled scale (reference :70-73)
            ndf_i = min(64, self.ndf * (2 ** (self.num_D - 1 - i)))
            stack = _NLayerStack(
                ndf_i, self.n_layers, ndim=2, norm=self.norm,
                name=f"scale{self.num_D - 1 - i}",
            )
            results.append(stack(x))
            if i != self.num_D - 1:
                x = _avg_pool_nd(x, 2, (2, 2))
        return results


class MultiscaleDiscriminator3D(nn.Module):
    """MoCoGAN-HD motion discriminator over (frame0 ‖ frame_k) stacks
    (reference mocoganhd_video_disc.py + ModelD_3d). Videos with more than
    16 frames are downsampled in time as well (reference :80-89).

    __call__(x: (N, T, H, W, C)) -> list over num_D scales of feature lists.
    """

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 2
    n_frames: int = 16
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        results = []
        pool_strides = (2, 2, 2) if self.n_frames > 16 else (1, 2, 2)
        for i in range(self.num_D):
            ndf_i = min(64, self.ndf * (2 ** (self.num_D - 1 - i)))
            stack = _NLayerStack(
                ndf_i, self.n_layers, ndim=3, norm=self.norm,
                name=f"scale{self.num_D - 1 - i}",
            )
            results.append(stack(x))
            if i != self.num_D - 1:
                x = _avg_pool_nd(x, 3, pool_strides)
        return results


class GaussianNoise(nn.Module):
    """Optional additive input noise for discriminator regularization
    (reference mocogan_discriminator.py:16-25 Noise). Active only in
    training with a 'noise' PRNG stream provided."""

    sigma: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # The reference's Noise layer is active whenever use_noise is set —
        # in both discriminator and generator passes (it never checks
        # self.training). Here activity is controlled by providing a
        # 'noise' PRNG stream: no rng, no noise.
        if not self.has_rng("noise"):
            return x
        key = self.make_rng("noise")
        return x + self.sigma * jax.random.normal(key, x.shape, x.dtype)


class PatchImageDiscriminator(nn.Module):
    """MoCoGAN patch image discriminator
    (reference mocogan_discriminator.py:74-111): 6 k4s2 conv+BN+LeakyReLU
    stages, patch logit map output."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        widths = [1, 2, 4, 8, 16]
        for i, m in enumerate(widths):
            if self.use_noise:
                x = GaussianNoise(self.noise_sigma)(x, train=train)
            x = nn.Conv(
                self.ndf * m, (4, 4), strides=2, padding=1, use_bias=False,
                kernel_init=conv_init,
            )(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(
            1, (4, 4), strides=2, padding=1, use_bias=False,
            kernel_init=conv_init,
        )(x)
        return jnp.squeeze(x, axis=-1)


class PatchVideoDiscriminator(nn.Module):
    """MoCoGAN patch video discriminator
    (reference mocogan_discriminator.py:166-205): 3D convs with stride
    (1,2,2), time dim preserved until the logit map."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        plan = [
            (self.ndf, (4, 4, 4)),
            (self.ndf * 2, (4, 4, 4)),
            (self.ndf * 4, (4, 4, 4)),
            (self.ndf * 8, (1, 4, 4)),
            (self.ndf * 16, (1, 4, 4)),
        ]
        for i, (nf, k) in enumerate(plan):
            if self.use_noise:
                x = GaussianNoise(self.noise_sigma)(x, train=train)
            x = nn.Conv(
                nf, k, strides=(1, 2, 2),
                padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                kernel_init=conv_init,
            )(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(
            1, (4, 4, 4), strides=(1, 2, 2),
            padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
            kernel_init=conv_init,
        )(x)
        return jnp.squeeze(x, axis=-1)


class ImageDiscriminator(nn.Module):
    """Non-patch MoCoGAN image discriminator -> scalar per sample
    (reference mocogan_discriminator.py:29-70)."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        widths = [1, 2, 4, 8, 16, 32]
        for i, m in enumerate(widths):
            if self.use_noise:
                x = GaussianNoise(self.noise_sigma)(x, train=train)
            x = nn.Conv(
                self.ndf * m, (4, 4), strides=2, padding=1, use_bias=False,
                kernel_init=conv_init,
            )(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(
            1, (4, 4), strides=1, padding=0, use_bias=False,
            kernel_init=conv_init,
        )(x)
        return x.reshape(x.shape[0], -1).mean(axis=-1)


class VideoDiscriminator(nn.Module):
    """Non-patch MoCoGAN video discriminator -> scalar per sample
    (reference mocogan_discriminator.py:116-161)."""

    ndf: int = 64
    use_noise: bool = False
    noise_sigma: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        plan = [
            (self.ndf, (4, 4, 4)),
            (self.ndf * 2, (4, 4, 4)),
            (self.ndf * 4, (4, 4, 4)),
            (self.ndf * 8, (4, 4, 4)),
            (self.ndf * 16, (4, 4, 4)),
            (self.ndf * 32, (1, 4, 4)),
        ]
        for i, (nf, k) in enumerate(plan):
            if self.use_noise:
                x = GaussianNoise(self.noise_sigma)(x, train=train)
            x = nn.Conv(
                nf, k, strides=(1, 2, 2),
                padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                kernel_init=conv_init,
            )(x)
            if i > 0:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(
            1, (1, 4, 4), strides=1, padding=0, use_bias=False,
            kernel_init=conv_init,
        )(x)
        return x.reshape(x.shape[0], -1).mean(axis=-1)


class NLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN + sigmoid (reference models/discriminator.py:17-67);
    BatchNorm by default, ActNorm optional."""

    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.ndf, (4, 4), strides=2, padding=1, kernel_init=conv_init
        )(x)
        x = nn.leaky_relu(x, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = nn.Conv(
                self.ndf * nf_mult, (4, 4), strides=2, padding=1,
                use_bias=self.use_actnorm, kernel_init=conv_init,
            )(x)
            if self.use_actnorm:
                x = ActNorm(self.ndf * nf_mult)(x, train=train)
            else:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.leaky_relu(x, 0.2)
        nf_mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(
            self.ndf * nf_mult, (4, 4), strides=1, padding=1,
            use_bias=self.use_actnorm, kernel_init=conv_init,
        )(x)
        if self.use_actnorm:
            x = ActNorm(self.ndf * nf_mult)(x, train=train)
        else:
            x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (4, 4), strides=1, padding=1, kernel_init=conv_init)(x)
        return jax.nn.sigmoid(x)
