"""Alignment-regression network: predict the inverse face perturbation.

The dataset's alignment mode (reference TemporalAlignment/dataset.py:377-397)
emits (perturbed face ‖ background) inputs with the NEGATED ground-truth
transform amounts `(-rotation, -tx, -ty)` as regression targets — the
"TemporalAlignment" network of the repo's namesake experiment. The
reference repo ships the data path but not the model/trainer; this module
completes it: a compact strided-conv regressor over the 6-channel
composite, trained with MSE against the inverse transforms
(see faceoff_tpu/train/alignment.py).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class AlignmentNet(nn.Module):
    """(N, H, W, 6) composite -> (N, 3) predicted inverse
    (rotation deg, tx px, ty px)."""

    widths: tuple = (32, 64, 128, 128)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for w in self.widths:
            h = nn.Conv(w, (4, 4), strides=2, padding=1, dtype=self.dtype)(h)
            h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        h = nn.relu(nn.Dense(128, dtype=self.dtype)(h))
        out = nn.Dense(3, dtype=self.dtype)(h)
        return out.astype(jnp.float32)
