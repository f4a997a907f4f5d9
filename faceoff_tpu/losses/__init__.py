from faceoff_tpu.losses.reconstruction import mse_loss, l1_loss
from faceoff_tpu.losses.gan import (
    hinge_d_loss,
    vanilla_d_loss,
    hinge_g_loss,
    lsgan_loss,
    bce_logits_loss,
    relativistic_average_lsgan,
    multiscale_gan_loss,
)

__all__ = [
    "mse_loss",
    "l1_loss",
    "hinge_d_loss",
    "vanilla_d_loss",
    "hinge_g_loss",
    "lsgan_loss",
    "bce_logits_loss",
    "relativistic_average_lsgan",
    "multiscale_gan_loss",
]
