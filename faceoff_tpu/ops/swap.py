"""On-device cross-identity swap preparation.

The host swap path (cli/swap.py + data/geometry.generate_warped_image,
matching reference face_translation_videos3_utils.py:139-194) runs per
frame on the CPU: hull mask -> enlarge -> segment source face ->
similarity-warp the 5 stable landmarks onto the target's -> composite over
the target with its face features removed. At inference that serializes
the whole video through cv2 before the model ever runs.

This module fuses the same geometry into ONE jitted device program over a
whole clip (BASELINE config 5: "on-TPU landmark crop/align preprocessing +
cross-id swap inference pipeline"): convex hulls via support functions,
Umeyama in closed form, one gather per frame for the warp — then the
6-channel model input comes out already normalized, so swap inference is
a single XLA program end-to-end when composed with the VQVAE forward.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from faceoff_tpu.ops import warp as W

STABLE_POINTS = (33, 36, 39, 42, 45)  # reference :144


def _laplace3(x: jnp.ndarray) -> jnp.ndarray:
    """Discrete Laplacian over the last 3 axes (H, W, C) with symmetric
    boundaries — the stencil scipy.ndimage.laplace applies to an (H, W, C)
    image (it includes the channel axis; boundary mode 'reflect')."""
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (1, 1)]
    p = jnp.pad(x, pad, mode="symmetric")
    return (
        p[..., :-2, 1:-1, 1:-1] + p[..., 2:, 1:-1, 1:-1]
        + p[..., 1:-1, :-2, 1:-1] + p[..., 1:-1, 2:, 1:-1]
        + p[..., 1:-1, 1:-1, :-2] + p[..., 1:-1, 1:-1, 2:]
        - 6.0 * x
    )


def poisson_blend(
    target: jnp.ndarray,
    src: jnp.ndarray,
    mask: jnp.ndarray,
    iters: int = 1024,
) -> jnp.ndarray:
    """Jittable iterative Laplacian blending — the device twin of
    data/geometry.poisson_blend (reference
    face_translation_videos3_utils.py:79-82): `iters` Jacobi relaxation
    steps as one lax.scan. Float images in [0, 1], shape (..., H, W, C);
    the reference passes the warped face image itself as `mask`."""

    def body(out, _):
        return out + 0.25 * mask * _laplace3(out - src), None

    out, _ = jax.lax.scan(
        body, target.astype(jnp.float32), None, length=iters
    )
    return jnp.clip(out, 0.0, 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("hull_start", "hull_end", "enlargement", "poisson",
                     "poisson_iters"),
)
def prepare_swap_batch(
    src_frames: jnp.ndarray,
    src_landmarks: jnp.ndarray,
    tgt_frames: jnp.ndarray,
    tgt_landmarks: jnp.ndarray,
    *,
    hull_start: int = 17,
    hull_end: int = 67,
    enlargement: int = 10,
    poisson: bool = False,
    poisson_iters: int = 1024,
) -> Dict[str, jnp.ndarray]:
    """Batched source->target face transfer (no perturbation — this is the
    inference path, reference dataset.py:341-354 cross-identity mode).

    src/tgt_frames: (N, H, W, 3) uint8 or float in [0, 255];
    src/tgt_landmarks: (N, 68, 2) pixel coords in those frames.

    Returns (all float32 in [-1, 1]):
      input:      (N, H, W, 6) — warped source face ‖ target background
                  (the 6-channel model conditioning, reference utils.py:29-38)
      source:     (N, H, W, 3) warped source face stream
      background: (N, H, W, 3) target-without-face-features stream
      combined:   (N, H, W, 3) naive paste composite (reference :99-107)
    """
    n, h, w = src_frames.shape[:3]
    src01 = src_frames.astype(jnp.float32) / 255.0
    tgt01 = tgt_frames.astype(jnp.float32) / 255.0
    sp = jnp.asarray(STABLE_POINTS)

    def pre(s_img, s_lms, t_lms):
        # enlarged no-jaw hull, segment the source face (reference :135-136)
        s_mask = W.convex_mask(
            s_lms[hull_start:hull_end], h, w, enlarge=float(enlargement)
        )
        face = s_img * s_mask[..., None]
        # similarity transform on the 5 stable landmarks (reference :85-96)
        M = W.umeyama_similarity(s_lms[sp], t_lms[sp])
        return face, M

    def post(warped_face, s_img, t_img, t_lms):
        # target with face features removed (reference :139-194 uses the
        # enlarged no-jaw hull for the 'without_face_features' stream)
        t_mask = W.convex_mask(
            t_lms[hull_start:hull_end], h, w, enlarge=float(enlargement)
        )
        background = t_img * (1.0 - t_mask)[..., None]

        # naive paste: zero the target where the warped face has content,
        # then add (reference combine_images :99-107)
        if poisson:
            # reference poisson variant (:184-185): Laplacian-blend the
            # source into the target, modulated by the warped face image
            combined = poisson_blend(
                t_img, s_img, warped_face, iters=poisson_iters
            )
        else:
            t_mask_full = W.convex_mask(t_lms, h, w)
            has_face = (warped_face.sum(axis=-1, keepdims=True) > 0).astype(
                jnp.float32
            )
            combined = (
                t_img * (1.0 - t_mask_full)[..., None] * (1.0 - has_face)
                + warped_face
            )
        return background, combined

    s_lms_f = src_landmarks.astype(jnp.float32)
    t_lms_f = tgt_landmarks.astype(jnp.float32)
    # the warp sits OUTSIDE the per-item vmaps so the whole batch routes
    # through one MXU warp kernel on TPU (ops.warp.batched_bilinear_warp)
    faces, Ms = jax.vmap(pre)(src01, s_lms_f, t_lms_f)
    source = W.affine_warp(faces, Ms)
    background, combined = jax.vmap(post)(
        source, src01, tgt01, t_lms_f,
    )

    def to_pm1(x):
        return jnp.clip(x, 0.0, 1.0) * 2.0 - 1.0

    source = to_pm1(source)
    background = to_pm1(background)
    return {
        "input": jnp.concatenate([source, background], axis=-1),
        "source": source,
        "background": background,
        "combined": to_pm1(combined),
    }
