"""Accelerated input path: raw frames + landmarks in, training batch out —
all geometry on the accelerator.

The reference's input pipeline does hull rasterization, masking,
perturbation and compositing per frame on CPU workers at batch size 1,
which starves the accelerator (SURVEY §3.1: "often the true bottleneck").
Host workers here only decode JPEGs and stack landmarks; everything else —
convex-hull masks, face/background split, the composite random
perturbation, colour jitter, normalization — runs as ONE jitted device
program over the whole batch (faceoff_tpu.ops.warp):

    host:   (B, T, H, W, 3) uint8 frames, (B, T, 68, 2) landmarks
    device: {"input": (B,T,H,W,6), "gt": (B,T,H,W,3)} in [-1, 1]

Randomness is a JAX PRNG key — bitwise reproducible across hosts/devices.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from faceoff_tpu.ops import warp as W


def eye_centers_from_landmarks(lms: jnp.ndarray) -> jnp.ndarray:
    """(..., 68, 2) -> (..., 2) midpoint of the eye centroids
    (reference perturbations.py:183-202)."""
    left = jnp.mean(lms[..., 36:41, :], axis=-2)
    right = jnp.mean(lms[..., 42:47, :], axis=-2)
    return (left + right) / 2.0


@functools.partial(
    jax.jit,
    static_argnames=("hull_start", "hull_end", "color_jitter"),
)
def prepare_train_batch(
    key: jax.Array,
    frames: jnp.ndarray,
    landmarks: jnp.ndarray,
    *,
    hull_start: int = 17,
    hull_end: int = 67,
    color_jitter: str = "",
) -> Dict[str, jnp.ndarray]:
    """Device-side equivalent of the self-supervised jitter item
    (reference TemporalAlignment/dataset.py:356-375 +
    perturbed_single_image :34-54).

    frames: (B, T, H, W, 3) uint8/float; landmarks: (B, T, 68, 2).
    """
    b, t, h, w = frames.shape[:4]
    imgs = frames.astype(jnp.float32) / 127.5 - 1.0
    flat_imgs = imgs.reshape(b * t, h, w, 3)
    flat_lms = landmarks.reshape(b * t, 68, 2)

    # hull masks for every frame at once
    masks = jax.vmap(
        lambda p: W.convex_mask(p, h, w)
    )(flat_lms[:, hull_start:hull_end])[..., None]

    # the masked face keeps background at the "black" extreme (-1), as the
    # uint8 pipeline's multiplicative mask does (geometry.apply_mask)
    face = (flat_imgs + 1.0) * masks - 1.0
    background = (flat_imgs + 1.0) * (1.0 - masks) - 1.0

    k_perturb, k_jit = jax.random.split(key)
    eyes = eye_centers_from_landmarks(flat_lms)
    # perturb in [0, 1] space so empty regions stay empty under resampling
    face01 = (face + 1.0) * 0.5
    perturbed = W.perturb_clip(k_perturb, face01, eyes)

    if color_jitter:
        shape = (b, 1, 1, 1, 1) if color_jitter == "const" else (
            b * t, 1, 1, 1
        )
        kb, ks = jax.random.split(k_jit)
        brightness = jax.random.uniform(kb, shape, minval=1.0, maxval=1.5)
        saturation = jax.random.uniform(ks, shape, minval=1.0, maxval=1.5)
        if color_jitter == "const":
            brightness = jnp.broadcast_to(
                brightness, (b, t, 1, 1, 1)
            ).reshape(b * t, 1, 1, 1)
            saturation = jnp.broadcast_to(
                saturation, (b, t, 1, 1, 1)
            ).reshape(b * t, 1, 1, 1)
        p = perturbed * brightness
        gray = (
            0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
        )[..., None]
        perturbed = jnp.clip(gray + saturation * (p - gray), 0.0, 1.0)

    source = perturbed * 2.0 - 1.0
    inputs = jnp.concatenate([source, background], axis=-1)
    return {
        "input": inputs.reshape(b, t, h, w, 6),
        "gt": imgs,
    }


class RawClipLoader:
    """Host loader yielding (frames uint8, landmarks) batches for the
    device pipeline — JPEG decode + npz read only, no geometry."""

    def __init__(
        self, dataset, batch_clips: int = 1, *, num_workers: int = 8,
        prefetch: int = 2, seed: int = 0, shuffle: bool = True,
        shard_index: int = 0, shard_count: int = 1,
    ):
        from faceoff_tpu.data.pipeline import DataLoader

        def pack(items):
            return {
                "frames": np.stack([it["frames"] for it in items]),
                "landmarks": np.stack([it["landmarks"] for it in items]),
            }

        # reuse DataLoader's threading by wrapping the dataset with a
        # raw-item view
        class _RawView:
            def __init__(self, ds):
                self.ds = ds

            def __len__(self):
                return len(self.ds)

            def get_item(self, index, rng):
                from faceoff_tpu.data.dataset import (
                    _landmark_paths,
                    load_window_frames,
                )

                ds = self.ds
                paths = _landmark_paths(ds.videos[index])
                window = ds._sample_window(paths, rng)
                frames, lms = load_window_frames(window, ds.resolution)
                return {"frames": frames, "landmarks": lms}

        self.loader = DataLoader(
            _RawView(dataset), batch_clips, shuffle=shuffle,
            num_workers=num_workers, prefetch=prefetch, seed=seed, pack=pack,
            shard_index=shard_index, shard_count=shard_count,
        )

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        return iter(self.loader)
