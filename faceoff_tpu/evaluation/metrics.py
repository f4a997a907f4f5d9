"""Reconstruction quality metrics: PSNR, SSIM, LPIPS.

The reference validates by eye (mp4 dumps) and tracks only MSE scalars
(SURVEY §4); quantitative quality evaluation is one of the gaps the
rebuild fills. All metrics take [-1, 1] channels-last images/clips and are
jittable.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 2.0):
    """Peak signal-to-noise ratio in dB over the full array."""
    mse = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    )
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 2.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean structural similarity (Wang et al.) with a Gaussian window.

    pred/target: (N, H, W, C) in [-1, 1]. Returns the mean SSIM scalar.
    """
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)
    n_ch = pred.shape[-1]
    # depthwise filter: (H, W, in=1, ch_mult=1) applied per channel
    kern4 = jnp.tile(kern[:, :, None, None], (1, 1, 1, n_ch))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kern4,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=n_ch,
        )

    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mu_p, mu_t = filt(p), filt(t)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p = filt(p * p) - mu_pp
    sigma_t = filt(t * t) - mu_tt
    sigma_pt = filt(p * t) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)


def evaluate_reconstruction(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    lpips_apply=None,
    lpips_vars=None,
) -> Dict[str, jnp.ndarray]:
    """Standard reconstruction report for (N, H, W, C) or (B, T, H, W, C)
    batches in [-1, 1]."""
    if pred.ndim == 5:
        pred = pred.reshape((-1,) + pred.shape[2:])
        target = target.reshape((-1,) + target.shape[2:])
    out = {
        "mse": jnp.mean((pred - target) ** 2),
        "l1": jnp.mean(jnp.abs(pred - target)),
        "psnr": psnr(pred, target),
        "ssim": ssim(pred, target),
    }
    if lpips_apply is not None:
        out["lpips"] = lpips_apply(lpips_vars, target, pred)
    return out
