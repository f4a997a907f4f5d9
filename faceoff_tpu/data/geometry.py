"""Landmark geometry: hull masks, similarity warps, source->target alignment.

Host-side numpy/OpenCV implementations of the face-compositing geometry
(behaviour of reference datasets/face_translation_videos3_utils.py). The
similarity transform is estimated with the Umeyama closed form directly in
numpy (the reference pulls in skimage for this,
face_translation_videos3_utils.py:85-96).

Landmark contract: 68-point iBUG layout, pixel coordinates (x, y) on the
resized 256x256 frame. Hull masks use points 17:67 (jaw excluded —
reference TemporalAlignment/dataset.py:23-31); warps align the 5 stable
points [33, 36, 39, 42, 45] (nose bridge + eye corners — reference
face_translation_videos3_utils.py:144).
"""

from __future__ import annotations

from typing import Dict, Tuple

import cv2
import numpy as np

STABLE_POINTS = (33, 36, 39, 42, 45)
HULL_SLICE = slice(17, None)  # full-hull variant uses all 68


def resize_frame(frame: np.ndarray, resize_dim: int = 256) -> np.ndarray:
    """Pad to square with zeros, then resize (reference
    face_translation_videos3_utils.py:19-30)."""
    h, w = frame.shape[:2]
    if h > w:
        padw, padh = (h - w) // 2, 0
    else:
        padw, padh = 0, (w - h) // 2
    padded = cv2.copyMakeBorder(
        frame, padh, padh, padw, padw, cv2.BORDER_CONSTANT, value=0
    )
    return cv2.resize(
        padded, (resize_dim, resize_dim), interpolation=cv2.INTER_LINEAR
    )


def convex_hull_mask(shape: Tuple[int, ...], points: np.ndarray) -> np.ndarray:
    """Filled convex hull of landmark points as a uint8 {0,255} mask
    (reference face_translation_videos3_utils.py:41-64). `shape` is the
    image shape; the mask matches its first two dims (plus channels)."""
    pts = np.asarray(points, np.int32).reshape(-1, 2)
    hull = cv2.convexHull(pts)
    mask = np.zeros(shape, np.uint8)
    cv2.fillConvexPoly(mask, hull, (255,) * (1 if len(shape) == 2 else shape[2]))
    return mask


def bounding_box_mask(shape: Tuple[int, ...], points: np.ndarray) -> np.ndarray:
    """Axis-aligned landmark bounding-box mask — the `requires_bb` variant
    (reference datasets/face_translation_videos3_utils_bb.py:65,190-194:
    generate_convex_hull_bb + estimate_bb_coordinates)."""
    pts = np.asarray(points)
    x1, y1 = np.floor(pts.min(axis=0)).astype(int)
    x2, y2 = np.ceil(pts.max(axis=0)).astype(int)
    mask = np.zeros(shape, np.uint8)
    h, w = shape[:2]
    mask[max(y1, 0): min(y2, h), max(x1, 0): min(x2, w)] = 255
    return mask


def enlarge_mask(mask: np.ndarray, enlargement: int = 10) -> np.ndarray:
    """Grow the mask boundary by redrawing its hull contour with a thick pen
    (reference face_translation_videos3_utils.py:66-77)."""
    out = mask.copy()
    gray = mask if mask.ndim == 2 else cv2.cvtColor(mask, cv2.COLOR_BGR2GRAY)
    _, thresh = cv2.threshold(gray, 50, 255, 0)
    contours, _ = cv2.findContours(
        thresh, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
    )
    color = (255,) * (1 if mask.ndim == 2 else mask.shape[2])
    for c in contours:
        hull = cv2.convexHull(c)
        cv2.drawContours(out, [hull], -1, color, enlargement)
    return out


def apply_mask(mask: np.ndarray, image: np.ndarray) -> np.ndarray:
    """(mask/255) * image (reference face_translation_videos3_utils.py:135-136)."""
    return ((mask / 255.0) * image).astype(np.uint8)


def umeyama_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (rotation+scale+translation)
    mapping src points onto dst points. Returns a 2x3 affine matrix.

    Closed-form per Umeyama (1991); replaces skimage
    `estimate_transform('similarity', ...)` (reference
    face_translation_videos3_utils.py:85-87).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / n
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, d])
    R = U @ D @ Vt
    var_s = (sc ** 2).sum() / n
    scale = np.trace(np.diag(S) @ D) / var_s if var_s > 0 else 1.0
    t = mu_d - scale * (R @ mu_s)
    M = np.zeros((2, 3))
    M[:2, :2] = scale * R
    M[:, 2] = t
    return M


def warp_affine(
    image: np.ndarray,
    M: np.ndarray,
    out_size: Tuple[int, int] = (256, 256),
    interp: int = cv2.INTER_LINEAR,
) -> np.ndarray:
    """Apply a 2x3 affine to an image (zeros outside)."""
    return cv2.warpAffine(
        image, np.asarray(M, np.float64), (out_size[1], out_size[0]), flags=interp
    )


def warp_to_landmarks(
    src_points: np.ndarray,
    dst_points: np.ndarray,
    image: np.ndarray,
    out_size: Tuple[int, int] = (256, 256),
) -> Tuple[np.ndarray, np.ndarray]:
    """Similarity-warp image so src_points land on dst_points
    (reference face_translation_videos3_utils.py:85-96). Returns
    (warped, 2x3 matrix)."""
    M = umeyama_similarity(src_points, dst_points)
    return warp_affine(image, M, out_size), M


def eye_geometry(landmarks: np.ndarray) -> Tuple[float, Tuple[float, float], float]:
    """(roll angle deg, eyes centre, inter-eye distance) from landmarks
    (reference face_translation_videos3_utils.py:110-133). Eye point ranges
    36:41 / 42:47 follow the reference exactly."""
    left = landmarks[36:41].mean(axis=0).astype(int)
    right = landmarks[42:47].mean(axis=0).astype(int)
    dy = float(right[1] - left[1])
    dx = float(right[0] - left[0])
    angle = float(np.degrees(np.arctan2(dy, dx)))
    center = ((left[0] + right[0]) / 2.0, (left[1] + right[1]) / 2.0)
    dist = float(np.hypot(dx, dy))
    return angle, center, dist


def combine_images(
    background: np.ndarray, foreground: np.ndarray, generate_mask: bool = True
) -> np.ndarray:
    """Paste composite: zero background where the foreground has content,
    then add (reference face_translation_videos3_utils.py:99-107)."""
    bg = background.copy()
    if generate_mask:
        bg[foreground[..., 0] != 0] = 0
    return bg + foreground


def poisson_blend(
    target: np.ndarray, src: np.ndarray, mask: np.ndarray, iters: int = 1024
) -> np.ndarray:
    """Iterative Laplacian blending (reference
    face_translation_videos3_utils.py:79-82). Float images in [0,1]."""
    from scipy.ndimage import laplace

    out = target.astype(np.float64)
    src = src.astype(np.float64)
    m = mask.astype(np.float64)
    for _ in range(iters):
        out = out + 0.25 * m * laplace(out - src)
    return np.clip(out, 0.0, 1.0)


def generate_aligned_image(
    source_landmarks: np.ndarray,
    target_landmarks: np.ndarray,
    source_image: np.ndarray,
    target_image: np.ndarray,
    *,
    enlargement: int = 5,
    require_full_mask: bool = False,
) -> Dict[str, np.ndarray]:
    """Eye-geometry alignment variant of the face transfer
    (reference face_translation_videos3_utils.py:196-254
    generate_aligned_image): instead of a least-squares fit over the 5
    stable landmarks, the source face is rotated by the eye-roll
    difference, scaled by the inter-eye distance ratio, and translated to
    the target's eye centre — one cv2 rotation matrix with an added
    translation component."""
    src_rot, src_center, src_dist = eye_geometry(source_landmarks)
    tgt_rot, tgt_center, tgt_dist = eye_geometry(target_landmarks)

    angle = src_rot - tgt_rot  # target conditioned on source orientation
    scale = tgt_dist / max(src_dist, 1e-6)
    M = cv2.getRotationMatrix2D(src_center, angle, scale)
    M[0, 2] += tgt_center[0] - src_center[0]
    M[1, 2] += tgt_center[1] - src_center[1]

    if require_full_mask:
        src_mask = convex_hull_mask(source_image.shape, source_landmarks)
    else:
        src_mask = enlarge_mask(
            convex_hull_mask(source_image.shape, source_landmarks[HULL_SLICE]),
            enlargement,
        )
    src_face = apply_mask(src_mask, source_image)
    hw = source_image.shape[:2]
    warped_face = warp_affine(src_face, M, hw, interp=cv2.INTER_CUBIC)
    warped_mask = warp_affine(src_mask, M, hw, interp=cv2.INTER_CUBIC)
    warped_source = warp_affine(source_image, M, hw, interp=cv2.INTER_CUBIC)

    tgt_mask_full = convex_hull_mask(target_image.shape, target_landmarks)
    target_without_face = apply_mask(255 - tgt_mask_full, target_image)
    combined = combine_images(target_without_face, warped_face)

    return {
        "source_face_transformed": warped_face,
        "source_mask_transformed": warped_mask,
        "source_image_transformed": warped_source,
        "target_image": target_image,
        "target_mask_inv": 255 - tgt_mask_full,
        "combined": combined,
        "transform": M,
    }


def generate_warped_image(
    source_landmarks: np.ndarray,
    target_landmarks: np.ndarray,
    source_image: np.ndarray,
    target_image: np.ndarray,
    *,
    enlargement: int = 10,
    require_full_mask: bool = False,
    poisson: bool = False,
) -> Dict[str, np.ndarray]:
    """Full source->target face transfer for one frame pair.

    Behaviour of reference face_translation_videos3_utils.py:139-194: hull
    mask (no jaw) -> enlarge -> segment source face -> similarity-warp the
    5 stable landmarks onto the target's -> composite over the target with
    its face features removed. Images must already be 256x256 (use
    `resize_frame`); landmarks in that frame.

    Returns a dict instead of the reference's 9-tuple.
    """
    if require_full_mask:
        src_mask = convex_hull_mask(source_image.shape, source_landmarks)
        src_mask_tight = src_mask.copy()
    else:
        src_mask = convex_hull_mask(
            source_image.shape, source_landmarks[HULL_SLICE]
        )
        src_mask_tight = src_mask.copy()
        src_mask = enlarge_mask(src_mask, enlargement)

    src_face = apply_mask(src_mask, source_image)
    sp = np.asarray(STABLE_POINTS)
    warped_face, M = warp_to_landmarks(
        source_landmarks[sp], target_landmarks[sp], src_face,
        source_image.shape[:2],
    )
    warped_mask = warp_affine(src_mask, M, source_image.shape[:2])
    warped_mask_tight = warp_affine(src_mask_tight, M, source_image.shape[:2])
    warped_source = warp_affine(source_image, M, source_image.shape[:2])

    tgt_mask_full = convex_hull_mask(target_image.shape, target_landmarks)
    tgt_mask_nojaw = enlarge_mask(
        convex_hull_mask(target_image.shape, target_landmarks[HULL_SLICE]),
        enlargement,
    )
    target_without_face = apply_mask(255 - tgt_mask_full, target_image)
    target_without_face_features = apply_mask(255 - tgt_mask_nojaw, target_image)

    if poisson:
        combined = (
            poisson_blend(
                target_image / 255.0, source_image / 255.0, warped_face / 255.0
            )
            * 255
        ).astype(np.uint8)
    else:
        combined = combine_images(target_without_face, warped_face)

    return {
        "source_face_transformed": warped_face,
        "source_mask_transformed": warped_mask,
        "source_mask_tight": warped_mask_tight,
        "source_image_transformed": warped_source,
        "target_image": target_image,
        "target_mask_inv": 255 - tgt_mask_full,
        "combined": combined,
        "target_without_face_features": target_without_face_features,
        "source_image": source_image,
        "transform": M,
    }
