"""On-device batched image warping, masking and perturbation.

The reference performs all face segmentation, warping and perturbation on
CPU workers with cv2/Wand at batch size 1 — the acknowledged input
bottleneck (SURVEY §3.1 hot loops, §7 "host-bound input pipeline"). This
module moves that math onto the accelerator as batched, jittable ops:

  * `affine_warp`  — batched inverse-mapped bilinear affine warp (the
    equivalent of cv2.warpAffine over a whole clip at once);
  * `convex_mask`  — differentiable-free rasterization of convex hulls
    from landmark points via half-plane tests (replaces
    cv2.fillConvexPoly, reference face_translation_videos3_utils.py:41-64);
  * `barrel_map` / `compose_warp` — radial distortion expressed as a
    sampling grid composed with the affine, so an arbitrary perturbation
    stack collapses into ONE gather per frame;
  * `perturb_clip` — the full composite perturbation
    (translate/rotate-about-eye-centre/scale/barrel, reference
    TemporalAlignment/perturbations.py:208-264) for a whole clip in one
    fused program, driven by a JAX PRNG key.

Coordinates are (x, y) pixel positions, matching the host-side geometry
module. All ops are shape-static and vmap/jit-friendly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W, C) at float coords x/y (H', W'); zeros outside."""
    h, w = img.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]

    def gather(xi, yi):
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        val = img[yi_c, xi_c]
        inside = (
            (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        )[..., None]
        return val * inside

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def identity_grid(h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x, y) sampling grids of shape (h, w)."""
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return x, y


def affine_grid(M_inv: jnp.ndarray, h: int, w: int):
    """Source-coordinate grid for warping with affine M (M_inv maps dest ->
    src): returns (xs, ys) (h, w)."""
    x, y = identity_grid(h, w)
    xs = M_inv[0, 0] * x + M_inv[0, 1] * y + M_inv[0, 2]
    ys = M_inv[1, 0] * x + M_inv[1, 1] * y + M_inv[1, 2]
    return xs, ys


def invert_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 affine."""
    A = M[:, :2]
    t = M[:, 2]
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    inv_a = (
        jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]]) / det
    )
    inv_t = -inv_a @ t
    return jnp.concatenate([inv_a, inv_t[:, None]], axis=1)


def affine_warp(images: jnp.ndarray, matrices: jnp.ndarray) -> jnp.ndarray:
    """Batched cv2.warpAffine equivalent.

    images: (N, H, W, C); matrices: (N, 2, 3) forward dest<-src affines
    (same convention as cv2: dest(x) = sample at M^{-1} x).
    """
    h, w = images.shape[1:3]

    def one(img, M):
        xs, ys = affine_grid(invert_affine(M), h, w)
        return _bilinear_sample(img, xs, ys)

    return jax.vmap(one)(images, matrices)


def rotation_about(
    angle_deg: jnp.ndarray, center: jnp.ndarray, scale: jnp.ndarray = 1.0
) -> jnp.ndarray:
    """cv2.getRotationMatrix2D equivalent: positive angle rotates
    counter-clockwise about `center` (x, y)."""
    a = jnp.radians(angle_deg)
    alpha = jnp.cos(a) * scale
    beta = jnp.sin(a) * scale
    cx, cy = center[0], center[1]
    return jnp.array(
        [
            [alpha, beta, (1 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1 - alpha) * cy],
        ]
    )


def translation(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy]])


def scale_about_center(s: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Zoom about the image centre keeping canvas size
    (reference perturbations.py:87-105 rescale)."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    return jnp.array(
        [[s, 0.0, cx * (1 - s)], [0.0, s, cy * (1 - s)]]
    )


def compose_affine(M2: jnp.ndarray, M1: jnp.ndarray) -> jnp.ndarray:
    """Affine composition: apply M1 then M2."""
    A = M2[:, :2] @ M1[:, :2]
    t = M2[:, :2] @ M1[:, 2] + M2[:, 2]
    return jnp.concatenate([A, t[:, None]], axis=1)


def convex_mask(
    points: jnp.ndarray,
    h: int,
    w: int,
    valid: Optional[jnp.ndarray] = None,
    n_directions: int = 128,
) -> jnp.ndarray:
    """Rasterize the convex hull of `points` (P, 2) as a (h, w) float mask
    (device replacement for cv2.convexHull + fillConvexPoly, reference
    face_translation_videos3_utils.py:41-64).

    Support-function formulation: q ∈ conv(P) iff for every direction d,
    d·q <= max_i d·p_i. Discretizing d over `n_directions` angles yields
    the intersection of that many half-planes — a circumscribing polygon
    whose radial error is ~r·(π/K)²/2 (< 0.05 px for K=128 at face
    scales). Fully vectorized: one (K, P) matmul for the supports, one
    (K, H·W) comparison for the mask; robust to interior points.
    """
    pts = points.astype(jnp.float32)
    k = n_directions
    ang = jnp.arange(k, dtype=jnp.float32) * (2 * jnp.pi / k)
    dirs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=1)  # (K, 2)
    proj = dirs @ pts.T  # (K, P)
    if valid is not None:
        proj = jnp.where(valid[None, :], proj, -jnp.inf)
    support = jnp.max(proj, axis=1)  # (K,)

    # d·q for every pixel as one (H·W, 2) @ (2, K) matmul (MXU-shaped and
    # cheap to constant-fold, unlike a (K, H, W) broadcast tensor)
    x, y = identity_grid(h, w)
    pix = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=1)  # (H*W, 2)
    dq = jnp.dot(pix, dirs.T, preferred_element_type=jnp.float32)
    inside = jnp.all(dq <= support[None, :] + 0.5, axis=1)
    return inside.reshape(h, w).astype(jnp.float32)


def barrel_grid(
    h: int, w: int, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
    d: jnp.ndarray, inverse: bool = False,
):
    """Radial distortion sampling grid (ImageMagick barrel convention,
    see faceoff_tpu/data/perturbations.py)."""
    x, y = identity_grid(h, w)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    norm = jnp.minimum(cx, cy)
    dx = (x - cx) / norm
    dy = (y - cy) / norm
    r = jnp.sqrt(dx * dx + dy * dy)
    poly = a * r ** 3 + b * r ** 2 + c * r + d
    scale = jnp.where(
        r > 1e-8,
        jnp.where(inverse, 1.0 / jnp.maximum(poly, 1e-6), poly),
        1.0,
    )
    return cx + dx * scale * norm, cy + dy * scale * norm


def warp_with_grid(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    return _bilinear_sample(img, xs, ys)


def perturb_clip(
    key: jax.Array,
    faces: jnp.ndarray,
    eye_centers: jnp.ndarray,
    *,
    translation_range: int = 3,
    rotation_range: float = 3.0,
    scale_range: Tuple[float, float] = (0.9, 1.1),
    barrel_strength: float = 0.5,
) -> jnp.ndarray:
    """Composite random perturbation of a whole clip on device, one fused
    gather per frame (behaviour of reference perturbations.py:208-264:
    random non-empty subset of {translate, rotate-about-eyes, scale,
    radial distortion}, independent per frame).

    faces: (T, H, W, C) float; eye_centers: (T, 2) (x, y).
    """
    t, h, w = faces.shape[:3]
    keys = jax.random.split(key, 6)
    enable = jax.random.bernoulli(keys[0], 0.5, (t, 4))
    # guarantee at least one perturbation per frame (reference :239-243):
    # force-enable translation-x on frames with none drawn
    none_on = ~jnp.any(enable, axis=1)
    enable = enable.at[:, 0].set(enable[:, 0] | none_on)

    txy = jax.random.randint(
        keys[1], (t, 2), -translation_range, translation_range + 1
    ).astype(jnp.float32)
    rot = jax.random.randint(
        keys[2], (t,), -int(rotation_range), int(rotation_range) + 1
    ).astype(jnp.float32)
    scl = jax.random.uniform(
        keys[3], (t,), minval=scale_range[0], maxval=scale_range[1]
    )
    barrel_b = jax.random.uniform(keys[4], (t,), maxval=barrel_strength)
    do_t = enable[:, 0:1]
    dx = jnp.where(do_t[:, 0], txy[:, 0], 0.0)
    dy = jnp.where(enable[:, 1], txy[:, 1], 0.0)
    ang = jnp.where(enable[:, 2], rot, 0.0)
    s = jnp.where(enable[:, 3], scl, 1.0)

    def one(img, dx, dy, ang, s, eye, bb):
        M = translation(dx, dy)
        M = compose_affine(rotation_about(ang, eye), M)
        M = compose_affine(scale_about_center(s, h, w), M)
        # sample grid = affine^{-1} then radial
        xs, ys = affine_grid(invert_affine(M), h, w)
        bxs, bys = barrel_grid(h, w, 0.0, bb, 0.0, 1.0 - bb / 2)
        # compose: first apply radial to dest coords, then affine-inverse
        xs2 = _bilinear_sample(xs[..., None], bxs, bys)[..., 0]
        ys2 = _bilinear_sample(ys[..., None], bxs, bys)[..., 0]
        return _bilinear_sample(img, xs2, ys2)

    return jax.vmap(one)(faces, dx, dy, ang, s, eye_centers, barrel_b)
