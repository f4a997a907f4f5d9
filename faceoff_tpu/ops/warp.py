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


def batched_bilinear_warp(
    imgs: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched bilinear sample: imgs (N, H, W, C) at coords xs/ys
    (N, OH, OW); zeros outside.

    Routing (the trace-time `use_pallas=None` auto-default): on TPU the
    4-tap gather lowers to a per-element loop (measured 680 ms for 128
    frames at 256px on a v5e — ~3x the train step it feeds), so the MXU
    one-hot-matmul kernel (ops.warp_pallas, measured 45 ms for the same
    batch) takes over; elsewhere XLA's gather is already fast. Both paths
    are parity-pinned by tests/test_warp_pallas.py.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from faceoff_tpu.ops.warp_pallas import bilinear_warp_frames

        return bilinear_warp_frames(imgs, xs, ys)
    return jax.vmap(_bilinear_sample)(imgs, xs, ys)


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


def affine_warp(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched cv2.warpAffine equivalent.

    images: (N, H, W, C); matrices: (N, 2, 3) forward dest<-src affines
    (same convention as cv2: dest(x) = sample at M^{-1} x).
    """
    h, w = images.shape[1:3]

    def grid(M):
        return affine_grid(invert_affine(M), h, w)

    xs, ys = jax.vmap(grid)(matrices)
    return batched_bilinear_warp(images, xs, ys, use_pallas=use_pallas)


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
    enlarge: float = 0.0,
) -> jnp.ndarray:
    """Rasterize the convex hull of `points` (P, 2) as a (h, w) float mask
    (device replacement for cv2.convexHull + fillConvexPoly, reference
    face_translation_videos3_utils.py:41-64).

    `enlarge` > 0 grows the hull by that many pixels: adding a constant to
    every support value is the exact Minkowski sum with an L2 ball (the
    analytic counterpart of the host path's contour-redraw enlargement,
    reference face_translation_videos3_utils.py:66-77).

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
    support = jnp.max(proj, axis=1) + enlarge  # (K,)

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


def umeyama_similarity(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform (rotation+scale+translation)
    mapping src points (P, 2) onto dst points, as a 2x3 affine — the
    device counterpart of data/geometry.umeyama_similarity (itself
    replacing skimage estimate_transform, reference
    face_translation_videos3_utils.py:85-87). jit/vmap-friendly."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[0]
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / n
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    ones = jnp.ones((), jnp.float32)
    D = jnp.stack([
        jnp.stack([ones, 0 * d]), jnp.stack([0 * d, d])
    ])
    R = U @ D @ Vt
    var_s = jnp.sum(sc * sc) / n
    scale = (S[0] + S[1] * d) / jnp.maximum(var_s, 1e-8)
    t = mu_d - scale * (R @ mu_s)
    return jnp.concatenate([scale * R, t[:, None]], axis=1)


def arc_grid(h: int, w: int, angle_deg: jnp.ndarray):
    """Sampling grid bending the image onto an annulus spanning
    `angle_deg` (ImageMagick 'arc'; same geometry as the host path,
    faceoff_tpu/data/perturbations.py arc_distort, itself matching
    reference perturbations.py:137-142). Returns (xs, ys, valid): pixels
    outside the annulus are invalid (black border in the reference)."""
    angle = jnp.radians(jnp.maximum(angle_deg.astype(jnp.float32), 1e-3))
    r_outer = w / angle
    r_inner = jnp.maximum(r_outer - h, 0.0)
    cx = (w - 1) / 2.0
    x, y = identity_grid(h, w)
    dx = x - cx
    dy = r_outer - y  # circle centre sits r_outer above the top edge
    r = jnp.sqrt(dx * dx + dy * dy)
    theta = jnp.arctan2(dx, dy)
    xs = (theta / angle + 0.5) * (w - 1)
    ys = (r_outer - r) / jnp.maximum(r_outer - r_inner, 1e-6) * (h - 1)
    valid = (
        (jnp.abs(theta) <= angle / 2) & (r >= r_inner) & (r <= r_outer)
    )
    return xs, ys, valid


def perturb_clip(
    key: jax.Array,
    faces: jnp.ndarray,
    eye_centers: jnp.ndarray,
    *,
    translation_range: int = 3,
    rotation_range: float = 3.0,
    scale_range: Tuple[int, int] = (90, 110),
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Composite random perturbation of a whole clip on device, one fused
    gather per frame — the same corruption distribution as the host path
    (reference perturbations.py:208-264, parameter grids :131-165 and
    ranges.py:1-3), independent per frame:

      * a uniform NON-EMPTY subset of {translate-x, translate-y,
        rotate-about-eyes, scale, distort}. The reference redraws the
        5 coin flips until the subset is non-empty (:191-192), i.e. a
        uniform draw over the 31 non-empty subsets — sampled here
        directly as an integer in [1, 32).
      * discrete parameter grids: integer pixel shifts in [-3, 3],
        integer degrees in [-3, 3], integer percent scale in [90, 110].
      * distort draws uniformly from {arc, barrel, barrel_inverse} with
        the reference's integer-grid coefficients.

    The affine stack and the radial/arc remap collapse into one composed
    sampling grid: dest -> distortion coords -> affine^{-1} -> source,
    with out-of-image coords at the distortion stage masked to black
    (cv2.remap/Wand border behaviour).

    faces: (T, H, W, C) float; eye_centers: (T, 2) (x, y).
    """
    t, h, w = faces.shape[:3]
    keys = jax.random.split(key, 11)
    subset = jax.random.randint(keys[0], (t,), 1, 32)
    en = [(subset >> k) & 1 for k in range(5)]  # tx, ty, rot, scale, distort

    txv = jax.random.randint(
        keys[1], (t,), -translation_range, translation_range + 1
    ).astype(jnp.float32)
    tyv = jax.random.randint(
        keys[2], (t,), -translation_range, translation_range + 1
    ).astype(jnp.float32)
    rotv = jax.random.randint(
        keys[3], (t,), -int(rotation_range), int(rotation_range) + 1
    ).astype(jnp.float32)
    sclv = (
        jax.random.randint(keys[4], (t,), scale_range[0], scale_range[1] + 1)
        .astype(jnp.float32) / 100.0
    )
    kind = jax.random.randint(keys[5], (t,), 0, 3)  # arc/barrel/inverse
    arc_ang = jax.random.randint(keys[6], (t,), 0, 31).astype(jnp.float32)
    bar_a = jax.random.randint(keys[7], (t,), 0, 11).astype(jnp.float32) / 10
    bar_b = jax.random.randint(keys[8], (t,), 2, 8).astype(jnp.float32) / 10
    bar_c = jax.random.randint(keys[9], (t,), 0, 6).astype(jnp.float32) / 10
    inv_bc = jax.random.randint(
        keys[10], (t, 2), jnp.array([0, -5]), jnp.array([3, 1])
    ).astype(jnp.float32) / 10

    dx = jnp.where(en[0], txv, 0.0)
    dy = jnp.where(en[1], tyv, 0.0)
    ang = jnp.where(en[2], rotv, 0.0)
    s = jnp.where(en[3], sclv, 1.0)

    def one_grid(dx, dy, ang, s, eye, en_d, kind, arc_ang, ba, bb, bc, ibc):
        # affine stack in the reference's application order (:195-210):
        # translate, then rotate about the eye centre, then zoom
        M = translation(dx, dy)
        M = compose_affine(rotation_about(ang, eye), M)
        M = compose_affine(scale_about_center(s, h, w), M)
        Minv = invert_affine(M)

        # distortion stage grids (distort is applied last on the host, so
        # it maps dest -> intermediate coords here)
        bxs, bys = barrel_grid(h, w, ba, bb, bc, 1.0)
        ixs, iys = barrel_grid(h, w, 0.0, ibc[0], ibc[1], 1.0, inverse=True)
        axs, ays, a_valid = arc_grid(h, w, arc_ang)
        xi, yi = identity_grid(h, w)

        xs_d = jnp.where(kind == 0, axs, jnp.where(kind == 1, bxs, ixs))
        ys_d = jnp.where(kind == 0, ays, jnp.where(kind == 1, bys, iys))
        valid = jnp.where(kind == 0, a_valid, True)
        # out-of-image coords at the distortion stage are black borders
        valid = valid & (
            (xs_d >= 0) & (xs_d <= w - 1) & (ys_d >= 0) & (ys_d <= h - 1)
        )
        xs_d = jnp.where(en_d, xs_d, xi)
        ys_d = jnp.where(en_d, ys_d, yi)
        valid = jnp.where(en_d, valid, True)

        # affine^{-1} evaluated at the distortion coords (closed form —
        # no second gather needed)
        xs2 = Minv[0, 0] * xs_d + Minv[0, 1] * ys_d + Minv[0, 2]
        ys2 = Minv[1, 0] * xs_d + Minv[1, 1] * ys_d + Minv[1, 2]
        return xs2, ys2, valid

    # grids are cheap VPU math (vmapped); the RESAMPLE is the hot op and
    # runs as ONE batched warp over the whole clip so it routes to the
    # MXU kernel on TPU (batched_bilinear_warp)
    xs2, ys2, valid = jax.vmap(one_grid)(
        dx, dy, ang, s, eye_centers,
        en[4].astype(bool), kind, arc_ang, bar_a, bar_b, bar_c, inv_bc,
    )
    out = batched_bilinear_warp(faces, xs2, ys2, use_pallas=use_pallas)
    return out * valid[..., None]
