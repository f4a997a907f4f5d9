"""Time-axis folding helpers.

The generator's 2D conv stages treat every frame as a batch element; the
temporal modules see the clip axis explicitly. The reference does the same
fold with squeeze/permute on NCHW tensors (reference utils.py:32,
models/vqvae_conv3d_latent.py:247-251); here the layout is channels-last
NTHWC and the fold is a single reshape — no transpose, no layout change on
TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def fold_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, C)."""
    b, t = x.shape[0], x.shape[1]
    return x.reshape((b * t,) + x.shape[2:])


def unfold_time(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B*T, H, W, C) -> (B, T, H, W, C)."""
    n = x.shape[0]
    if n % batch != 0:
        raise ValueError(f"cannot unfold {n} frames into batch {batch}")
    return x.reshape((batch, n // batch) + x.shape[1:])
