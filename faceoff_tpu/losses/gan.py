"""GAN loss library.

Covers every adversarial objective the reference trainers use:
  * hinge / vanilla discriminator losses (reference loss.py:15-25),
  * hinge generator loss (reference
    TemporalAlignment/models/mocoganhd_losses.py:22-24),
  * LSGAN / BCE objectives (reference mocoganhd_losses.py:56-106 and
    disc_trainers/train_vqvae_mocogan_disc.py:136-170),
  * Relativistic Average LSGAN over multiscale discriminator outputs
    (reference mocoganhd_losses.py:109-126).

Multiscale discriminators return a list (one per scale) of lists of
intermediate feature maps; only the final map per scale is a logit
(reference mocoganhd_video_disc.py:91-116). Helpers here accept either a
single logit array or that nested-list structure.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp

Logits = Union[jnp.ndarray, Sequence[Sequence[jnp.ndarray]]]


def _final_logits(d_out: Logits) -> List[jnp.ndarray]:
    """Normalize discriminator output to a flat list of per-scale logits."""
    if isinstance(d_out, (list, tuple)):
        outs = []
        for scale in d_out:
            if isinstance(scale, (list, tuple)):
                outs.append(scale[-1])
            else:
                outs.append(scale)
        return outs
    return [d_out]


def hinge_d_loss(logits_real: Logits, logits_fake: Logits) -> jnp.ndarray:
    total = 0.0
    reals, fakes = _final_logits(logits_real), _final_logits(logits_fake)
    for r, f in zip(reals, fakes):
        loss_real = jnp.mean(jax.nn.relu(1.0 - r))
        loss_fake = jnp.mean(jax.nn.relu(1.0 + f))
        total += 0.5 * (loss_real + loss_fake)
    return jnp.asarray(total)


def vanilla_d_loss(logits_real: Logits, logits_fake: Logits) -> jnp.ndarray:
    total = 0.0
    reals, fakes = _final_logits(logits_real), _final_logits(logits_fake)
    for r, f in zip(reals, fakes):
        total += 0.5 * (
            jnp.mean(jax.nn.softplus(-r)) + jnp.mean(jax.nn.softplus(f))
        )
    return jnp.asarray(total)


def hinge_g_loss(logits_fake: Logits) -> jnp.ndarray:
    total = 0.0
    for f in _final_logits(logits_fake):
        total += -jnp.mean(f)
    return jnp.asarray(total)


def lsgan_loss(logits: Logits, target_is_real: bool) -> jnp.ndarray:
    """Least-squares GAN: MSE against a 0/1 target (reference
    mocoganhd_losses.py:56-106, summed over scales)."""
    target = 1.0 if target_is_real else 0.0
    total = 0.0
    for l in _final_logits(logits):
        total += jnp.mean((l - target) ** 2)
    return jnp.asarray(total)


def bce_logits_loss(logits: Logits, target_is_real: bool) -> jnp.ndarray:
    """BCE-with-logits against a constant target (reference
    disc_trainers/train_vqvae_mocogan_disc.py:136-170 uses BCEWithLogitsLoss)."""
    target = 1.0 if target_is_real else 0.0
    total = 0.0
    for l in _final_logits(logits):
        # log-sigmoid formulation, numerically stable
        total += jnp.mean(
            jax.nn.softplus(l) - target * l
        )
    return jnp.asarray(total)


def relativistic_average_lsgan(
    logits_1: Logits, logits_2: Logits, target_is_real: bool
) -> jnp.ndarray:
    """RaLSGAN: MSE((D(x1) - mean D(x2)) - target) summed over scales
    (reference mocoganhd_losses.py:109-126)."""
    target = 1.0 if target_is_real else 0.0
    total = 0.0
    l1s, l2s = _final_logits(logits_1), _final_logits(logits_2)
    for a, b in zip(l1s, l2s):
        total += jnp.mean((a - jnp.mean(b) - target) ** 2)
    return jnp.asarray(total)


def gradient_penalty(
    disc_apply,
    real: jnp.ndarray,
    fake: jnp.ndarray,
    key,
    num_D: int = 2,
) -> jnp.ndarray:
    """WGAN-GP style gradient penalty on real/fake interpolates for
    multiscale discriminators (reference mocoganhd_losses.py:27-53:
    sum over scales of (||dD/dx||_2 - 1)^2, scaled 10/num_D).

    disc_apply: x -> multiscale logits; real/fake: matching video/image
    batches."""
    alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = alpha * real + (1 - alpha) * fake

    def scalar_outputs(x):
        outs = _final_logits(disc_apply(x))
        return [jnp.sum(o) for o in outs]

    total = 0.0
    n_scales = len(scalar_outputs(interp))
    for i in range(n_scales):
        g = jax.grad(lambda x: scalar_outputs(x)[i])(interp)
        # norm over channel axis per position, as the reference's
        # gradients.norm(2, dim=1)
        gn = jnp.sqrt(jnp.sum(g ** 2, axis=-1) + 1e-12)
        total += jnp.mean((gn - 1.0) ** 2)
    return total / num_D * 10.0


def multiscale_gan_loss(
    loss_kind: str, logits_real: Logits, logits_fake: Logits
) -> jnp.ndarray:
    """Dispatch for the discriminator objective by name."""
    if loss_kind == "hinge":
        return hinge_d_loss(logits_real, logits_fake)
    if loss_kind == "vanilla":
        return vanilla_d_loss(logits_real, logits_fake)
    if loss_kind == "lsgan":
        return 0.5 * (
            lsgan_loss(logits_real, True) + lsgan_loss(logits_fake, False)
        )
    if loss_kind == "bce":
        return bce_logits_loss(logits_real, True) + bce_logits_loss(
            logits_fake, False
        )
    if loss_kind == "ralsgan":
        return 0.5 * (
            relativistic_average_lsgan(logits_real, logits_fake, True)
            + relativistic_average_lsgan(logits_fake, logits_real, False)
        )
    raise ValueError(f"unknown GAN loss '{loss_kind}'")
