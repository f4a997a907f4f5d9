"""Contrastive face-similarity loss + Siamese embedding network.

Port of the reference's auxiliary identity-similarity components
(reference loss.py:120-177). The reference defines but never wires them
into a trainer (SURVEY §2 item 6); they are provided here for parity and
usable as an optional identity-preservation term.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def pairwise_distance(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6):
    """Euclidean distance per row (torch F.pairwise_distance)."""
    return jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + eps)


def contrastive_loss(
    out1: jnp.ndarray, out2: jnp.ndarray, label: jnp.ndarray,
    margin: float = 2.0,
) -> jnp.ndarray:
    """Hadsell-Chopra-LeCun contrastive loss (reference loss.py:120-136):
    label 0 = similar pair, 1 = dissimilar."""
    d = pairwise_distance(out1, out2)
    sim = (1.0 - label) * d ** 2
    dis = label * jnp.maximum(margin - d, 0.0) ** 2
    return jnp.mean(sim + dis)


class _FaceTower(nn.Module):
    """Single embedding tower: three reflect-padded conv+BN blocks, then a
    3-layer MLP head (reference loss.py:141-165)."""

    features: Tuple[int, ...]
    embed_dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]  # (N, H, W) -> single channel
        for f in self.features:
            x = jnp.pad(
                x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
            )
            x = nn.Conv(f, (3, 3), padding="VALID")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.embed_dim)(x)


class SiameseFaceEmbedder(nn.Module):
    """Siamese CNN for face similarity (reference loss.py:138-177
    SiameseNetworkFaceSimilarity): one weight-shared tower applied to both
    inputs; __call__ returns the mean pairwise embedding distance."""

    features: Tuple[int, ...] = (4, 8, 8)
    embed_dim: int = 5
    hidden: int = 500

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        tower = _FaceTower(self.features, self.embed_dim, self.hidden)
        e1 = tower(x1, train=train)
        e2 = tower(x2, train=train)
        return jnp.mean(pairwise_distance(e1, e2))
