"""Fréchet feature-distribution distances (FID/FVD family) for tracking
adversarial fine-tuning quality.

The reference tracks GAN quality only by eye (sample mp4 dumps,
disc_trainers/*; SURVEY §4-5) — adversarial progress is otherwise
invisible. This module provides the standard machinery:

  frechet_distance(mu1, cov1, mu2, cov2)   — closed form, jittable
  feature_stats(feats)                     — mean + covariance
  fid(real_feats, fake_feats)              — Fréchet distance between
                                             feature clouds
  vgg_features(lpips_vars, images)         — pooled VGG16 tap activations
                                             from the LPIPS backbone as the
                                             feature extractor

FID canonically uses InceptionV3-pool3 features and FVD an I3D network;
neither weight set is distributable here (zero egress), so the extractor
is pluggable and the default is the LPIPS VGG16 (converted weights when
supplied via --lpips_weights, else the fixed-seed random VGG — random
features still give a valid relative distance for tracking a single run,
cf. the random-feature FID literature, but values are NOT comparable to
published Inception-FID numbers; the metric is reported as `fd_vgg`).

The matrix square root uses an eigendecomposition of the symmetrized
product, stable for the small feature dims used here and jittable on TPU.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp


def feature_stats(feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D))."""
    feats = feats.astype(jnp.float32)
    mu = jnp.mean(feats, axis=0)
    centered = feats - mu
    n = feats.shape[0]
    cov = centered.T @ centered / jnp.maximum(n - 1, 1)
    return mu, cov


def _sqrtm_psd(mat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via eigh."""
    vals, vecs = jnp.linalg.eigh((mat + mat.T) / 2.0)
    vals = jnp.clip(vals, 0.0, None)
    return (vecs * jnp.sqrt(vals + eps)[None, :]) @ vecs.T


def frechet_distance(
    mu1: jnp.ndarray, cov1: jnp.ndarray, mu2: jnp.ndarray, cov2: jnp.ndarray
) -> jnp.ndarray:
    """d^2 = |mu1-mu2|^2 + Tr(cov1 + cov2 - 2 (cov1 cov2)^{1/2}).

    The cross term uses the standard symmetrization
    (cov1 cov2)^{1/2} ~ sqrt(sqrt(cov1) cov2 sqrt(cov1)) which is PSD.
    """
    mu1 = mu1.astype(jnp.float32)
    mu2 = mu2.astype(jnp.float32)
    diff = jnp.sum((mu1 - mu2) ** 2)
    s1 = _sqrtm_psd(cov1)
    covmean = _sqrtm_psd(s1 @ cov2 @ s1)
    return diff + jnp.trace(cov1) + jnp.trace(cov2) - 2.0 * jnp.trace(covmean)


def fid(real_feats: jnp.ndarray, fake_feats: jnp.ndarray) -> jnp.ndarray:
    """Fréchet distance between two (N, D) feature clouds."""
    mu_r, cov_r = feature_stats(real_feats)
    mu_f, cov_f = feature_stats(fake_feats)
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)


def vgg_features(
    lpips_vars, images: jnp.ndarray, max_dim: int = 64,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Pooled VGG16 tap activations as a Fréchet feature extractor.

    images: (N, H, W, 3) in [-1, 1]. Returns (N, D) with
    D = sum(min(ch, max_dim)) over the 5 LPIPS taps (spatially averaged,
    channel-truncated to keep covariance estimation sane at small N).
    lpips_vars: variables from models.lpips.init_lpips (converted weights
    or the fixed-seed random VGG).

    Frames are processed in chunks bounding the peak VGG activation
    footprint (the first 64-channel fp32 tap dominates): a whole 512px
    validation set in one batch exhausts a v5e's HBM. `chunk=None` sizes
    chunks to ~32 frames at 256px, scaled by pixel count.
    """
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    if chunk is None:
        chunk = max(1, (32 * 256 * 256) // (h * w))
    if n > chunk:
        return jnp.concatenate(
            [
                vgg_features(lpips_vars, images[i: i + chunk], max_dim, chunk)
                for i in range(0, n, chunk)
            ],
            axis=0,
        )

    from faceoff_tpu.models.lpips import _SCALE, _SHIFT, VGG16Slices

    prep = (images.astype(jnp.float32) - jnp.asarray(_SHIFT)) / jnp.asarray(
        _SCALE
    )
    taps = VGG16Slices().apply(
        {"params": lpips_vars["params"]["vgg"]}, prep
    )
    pooled = [jnp.mean(t.astype(jnp.float32), axis=(1, 2)) for t in taps]
    pooled = [p[:, : min(p.shape[1], max_dim)] for p in pooled]
    return jnp.concatenate(pooled, axis=-1)


def make_fd_vgg(lpips_vars) -> Callable:
    """fd(real, fake) on (N,H,W,3) [-1,1] image batches using the LPIPS
    VGG backbone (see module docstring for comparability caveats)."""

    def fd(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
        fr = vgg_features(lpips_vars, real)
        ff = vgg_features(lpips_vars, fake)
        return fid(fr, ff)

    return fd


def motion_features(
    lpips_vars, videos: jnp.ndarray, max_dim: int = 64
) -> jnp.ndarray:
    """Temporal-coherence features: pooled VGG activations of
    consecutive-frame DIFFERENCES. This is the FVD role (motion
    statistics) without I3D weights: per-frame features are blind to
    frame ordering, frame-difference features are not — flicker, judder
    and shuffled frames all move this distribution while leaving the
    per-frame one untouched (temporal coherence is the system's whole
    point, reference README.md:81-87).

    videos: (B, T, H, W, 3) in [-1, 1]. Returns (B*(T-1), D).
    """
    diffs = (videos[:, 1:] - videos[:, :-1]) * 0.5  # stay within [-1, 1]
    flat = diffs.reshape((-1,) + diffs.shape[2:])
    return vgg_features(lpips_vars, flat, max_dim)


def make_fd_video_features(lpips_vars) -> Tuple[Callable, Callable]:
    """Multi-batch Fréchet: extract per-batch features, compute stats once
    over ALL batches. Single-batch Fréchet stats are high-variance (one
    batch of --val_batches clips); accumulating features first makes the
    validation-cadence fd_vgg/fd_vgg_motion numbers stable.

    Returns (feats, finalize):
      feats(real, fake)  -> dict of (N, D) feature arrays for one batch of
                            (B, T, H, W, 3) clips in [-1, 1]
      finalize(chunks)   -> {'fd_vgg', 'fd_vgg_motion'} over the
                            concatenation of all chunks
    """

    def feats(real: jnp.ndarray, fake: jnp.ndarray):
        return {
            "frame_real": vgg_features(
                lpips_vars, real.reshape((-1,) + real.shape[2:])
            ),
            "frame_fake": vgg_features(
                lpips_vars, fake.reshape((-1,) + fake.shape[2:])
            ),
            "motion_real": motion_features(lpips_vars, real),
            "motion_fake": motion_features(lpips_vars, fake),
        }

    def finalize(chunks):
        cat = {
            k: jnp.concatenate([c[k] for c in chunks], axis=0)
            for k in chunks[0]
        }
        return {
            "fd_vgg": fid(cat["frame_real"], cat["frame_fake"]),
            "fd_vgg_motion": fid(cat["motion_real"], cat["motion_fake"]),
        }

    return feats, finalize


def make_fd_video(lpips_vars) -> Callable:
    """fd(real, fake) on (B,T,H,W,3) [-1,1] clips -> dict with
    `fd_vgg` (appearance: per-frame VGG Fréchet distance) and
    `fd_vgg_motion` (temporal: frame-difference VGG Fréchet distance)."""

    def fd(real: jnp.ndarray, fake: jnp.ndarray):
        fr = vgg_features(lpips_vars, real.reshape((-1,) + real.shape[2:]))
        ff = vgg_features(lpips_vars, fake.reshape((-1,) + fake.shape[2:]))
        return {
            "fd_vgg": fid(fr, ff),
            "fd_vgg_motion": fid(
                motion_features(lpips_vars, real),
                motion_features(lpips_vars, fake),
            ),
        }

    return fd
