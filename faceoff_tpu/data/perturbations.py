"""Perturbation engine: the self-supervised training signal.

Synthesizes the "imperfect blend" the generator learns to fix by randomly
perturbing the segmented source face: translations, rotation about the eye
centre, scaling, and nonlinear radial distortions
(behaviour of reference TemporalAlignment/perturbations.py:208-264 with
ranges from TemporalAlignment/ranges.py:1-3). At least one perturbation is
always applied; the ground-truth transform amounts are returned for the
alignment-regression mode (reference dataset.py:377-397).

The reference shells out to ImageMagick (Wand) for arc/barrel/inverse-barrel
distortions (perturbations.py:131-165). Those are closed-form radial remaps,
reimplemented here directly with cv2.remap:

  * barrel:          r_src = r_dst * (A r^3 + B r^2 + C r + D)
  * barrel_inverse:  r_src = r_dst / (A r^3 + B r^2 + C r + D)
    (radii normalized by half the min image dimension, ImageMagick's
    convention)
  * arc: the flat image is bent onto an annulus spanning `angle` degrees.

Randomness is explicit: every function takes a numpy Generator — no global
RNG (the reference uses the global `random` module throughout).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import cv2
import numpy as np

TRANSLATION_RANGE = 3  # pixels (reference ranges.py:1)
ROTATION_RANGE = 3.0  # degrees (reference ranges.py:2)
SCALE_RANGE = (90, 110)  # percent (reference ranges.py:3)
DISTORTIONS = ("arc", "barrel", "barrel_inverse")


def translate(image: np.ndarray, dx: float, dy: float) -> np.ndarray:
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(image, M, (image.shape[1], image.shape[0]))


def rotate(
    image: np.ndarray, angle_deg: float, center: Optional[Tuple[float, float]] = None
) -> np.ndarray:
    h, w = image.shape[:2]
    if center is None:
        center = (w // 2, h // 2)
    M = cv2.getRotationMatrix2D(center, angle_deg, 1.0)
    return cv2.warpAffine(image, M, (w, h))


def rescale(image: np.ndarray, magnification: float) -> np.ndarray:
    """Zoom about the centre keeping the canvas size
    (reference perturbations.py:87-105)."""
    h, w = image.shape[:2]
    res = cv2.resize(
        image, None, fx=magnification, fy=magnification,
        interpolation=cv2.INTER_CUBIC,
    )
    if magnification >= 1:
        cy, cx = res.shape[0] // 2, res.shape[1] // 2
        top, left = cy - h // 2, cx - w // 2
        return res[top: top + h, left: left + w]
    out = np.zeros_like(image)
    hs, ws = res.shape[:2]
    top, left = (h - hs) // 2, (w - ws) // 2
    out[top: top + hs, left: left + ws] = res
    return out


def _radial_remap(image: np.ndarray, src_r_of_dst_r) -> np.ndarray:
    """Remap dest polar radius -> source radius about the image centre."""
    h, w = image.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    norm = min(cx, cy)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx, dy = (xs - cx) / norm, (ys - cy) / norm
    r = np.sqrt(dx * dx + dy * dy)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(r > 1e-8, src_r_of_dst_r(r) / np.maximum(r, 1e-8), 1.0)
    map_x = (cx + dx * scale * norm).astype(np.float32)
    map_y = (cy + dy * scale * norm).astype(np.float32)
    return cv2.remap(image, map_x, map_y, cv2.INTER_LINEAR)


def barrel_distort(
    image: np.ndarray, a: float, b: float, c: float, d: float = 1.0
) -> np.ndarray:
    """ImageMagick 'barrel' (reference perturbations.py:144-153)."""
    return _radial_remap(
        image, lambda r: r * (a * r ** 3 + b * r ** 2 + c * r + d)
    )


def barrel_inverse_distort(
    image: np.ndarray, a: float, b: float, c: float, d: float = 1.0
) -> np.ndarray:
    """ImageMagick 'barrel_inverse' (reference perturbations.py:155-163)."""
    return _radial_remap(
        image,
        lambda r: r / np.maximum(a * r ** 3 + b * r ** 2 + c * r + d, 1e-6),
    )


def arc_distort(image: np.ndarray, angle_deg: float) -> np.ndarray:
    """Bend the image onto an annulus spanning `angle_deg`
    (ImageMagick 'arc', reference perturbations.py:137-142). Small angles
    approach identity; output is resized back to the input shape as the
    reference does (perturbations.py:140)."""
    angle = np.radians(max(float(angle_deg), 1e-3))
    h, w = image.shape[:2]
    # Annulus geometry: outer radius chosen so the arc length of the outer
    # edge equals the image width.
    r_outer = w / angle
    r_inner = max(r_outer - h, 0.0)
    cx = (w - 1) / 2.0
    # circle centre sits above the image so the annulus fits the canvas
    cy_arc = r_outer

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = xs - cx
    dy = cy_arc - ys
    r = np.sqrt(dx * dx + dy * dy)
    theta = np.arctan2(dx, dy)  # 0 at top, +/- angle/2 at edges

    src_x = (theta / angle + 0.5) * (w - 1)
    denom = max(r_outer - r_inner, 1e-6)
    src_y = (r_outer - r) / denom * (h - 1)

    inside = (
        (np.abs(theta) <= angle / 2) & (r >= r_inner) & (r <= r_outer)
    )
    map_x = np.where(inside, src_x, -1).astype(np.float32)
    map_y = np.where(inside, src_y, -1).astype(np.float32)
    out = cv2.remap(
        image, map_x, map_y, cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    return out


def find_eye_center(landmarks: np.ndarray) -> Tuple[float, float]:
    """Midpoint of the two eye centroids (reference perturbations.py:183-202;
    the reference function falls through without returning — fixed here)."""
    left = landmarks[36:41].mean(axis=0)
    right = landmarks[42:47].mean(axis=0)
    return (
        float((left[0] + right[0]) / 2.0),
        float((left[1] + right[1]) / 2.0),
    )


def random_distort(image: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """One of the three radial distortions with reference parameter ranges
    (reference perturbations.py:131-165)."""
    kind = DISTORTIONS[rng.integers(0, len(DISTORTIONS))]
    if kind == "arc":
        return arc_distort(image, float(rng.integers(0, 31)))
    if kind == "barrel":
        a = rng.integers(0, 11) / 10
        b = rng.integers(2, 8) / 10
        c = rng.integers(0, 6) / 10
        return barrel_distort(image, a, b, c, 1.0)
    b = rng.integers(0, 3) / 10
    c = rng.integers(-5, 1) / 10
    return barrel_inverse_distort(image, 0.0, b, c, 1.0)


def perturb_image_composite(
    face_image: np.ndarray,
    landmarks: np.ndarray,
    rng: np.random.Generator,
    *,
    translation_range: int = TRANSLATION_RANGE,
    rotation_range: float = ROTATION_RANGE,
    scale_range: Tuple[int, int] = SCALE_RANGE,
) -> Tuple[np.ndarray, Dict[str, float]]:
    """Apply a random non-empty subset of perturbations to a segmented face
    (reference perturbations.py:208-264). Rotation pivots on the eye centre.

    Returns (perturbed image, ground-truth transform amounts dict with keys
    translate_horizontal / translate_vertical / rotate_image).
    """
    eye_center = find_eye_center(landmarks)
    gt = {"translate_horizontal": 0.0, "translate_vertical": 0.0,
          "rotate_image": 0.0}

    names = ["tx", "ty", "rot", "scale", "distort"]
    chosen = []
    while not chosen:
        chosen = [n for n in names if rng.integers(0, 2)]

    out = face_image
    for n in chosen:
        if n == "tx":
            v = float(rng.integers(-translation_range, translation_range + 1))
            gt["translate_horizontal"] = v
            out = translate(out, v, 0)
        elif n == "ty":
            v = float(rng.integers(-translation_range, translation_range + 1))
            gt["translate_vertical"] = v
            out = translate(out, 0, v)
        elif n == "rot":
            v = float(rng.integers(-int(rotation_range), int(rotation_range) + 1))
            gt["rotate_image"] = v
            out = rotate(out, v, center=eye_center)
        elif n == "scale":
            v = float(rng.integers(scale_range[0], scale_range[1] + 1)) / 100.0
            out = rescale(out, v)
        else:
            out = random_distort(out, rng)
    return out, gt
