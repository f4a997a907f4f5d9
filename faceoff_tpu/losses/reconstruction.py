"""Reconstruction losses (reference train_faceoff_perceptual.py:21,37-40)."""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    )


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    )
