"""Synthetic video dataset generator for tests and benchmarks.

Writes datasets that satisfy the on-disk contract (see
faceoff_tpu/data/dataset.py): per-video directories of frames plus
per-frame 68-point landmark npz files. "Faces" are procedurally drawn
head shapes (skin ellipse, eyes, nose, mouth) moving over a textured
background, with geometrically consistent landmarks — enough structure for
the hull/warp/perturbation pipeline and for loss-decrease smoke training
without any real data. The reference has no such fixture (SURVEY §4: no
tests at all).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Tuple

import cv2
import numpy as np


def face_landmarks(
    center: Tuple[float, float], scale: float, angle_deg: float = 0.0
) -> np.ndarray:
    """Synthesize a plausible 68-point iBUG landmark set.

    Groups: 0-16 jaw, 17-26 brows, 27-35 nose, 36-41 / 42-47 eyes,
    48-67 mouth.
    """
    cx, cy = center
    s = scale
    pts = np.zeros((68, 2), np.float32)

    t = np.linspace(np.pi * 0.15, np.pi * 0.85, 17)
    pts[0:17, 0] = -np.cos(t) * s
    pts[0:17, 1] = np.sin(t) * s * 1.1

    bx = np.linspace(-0.6, -0.1, 5)
    pts[17:22, 0] = bx * s
    pts[17:22, 1] = (-0.45 - 0.08 * np.sin(np.linspace(0, np.pi, 5))) * s
    pts[22:27, 0] = -bx[::-1] * s
    pts[22:27, 1] = pts[17:22, 1][::-1]

    pts[27:31, 0] = 0
    pts[27:31, 1] = np.linspace(-0.35, 0.1, 4) * s
    pts[31:36, 0] = np.linspace(-0.15, 0.15, 5) * s
    pts[31:36, 1] = 0.18 * s

    for base, ex in ((36, -0.35), (42, 0.35)):
        et = np.linspace(0, 2 * np.pi, 6, endpoint=False)
        pts[base: base + 6, 0] = (ex + 0.12 * np.cos(et)) * s
        pts[base: base + 6, 1] = (-0.25 + 0.07 * np.sin(et)) * s

    mt = np.linspace(0, 2 * np.pi, 20, endpoint=False)
    pts[48:68, 0] = 0.25 * np.cos(mt) * s
    pts[48:68, 1] = (0.55 + 0.12 * np.sin(mt)) * s

    a = np.radians(angle_deg)
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
    pts = pts @ R.T
    pts[:, 0] += cx
    pts[:, 1] += cy
    return pts


def draw_face(
    img: np.ndarray, lms: np.ndarray, skin: Tuple[int, int, int]
) -> None:
    """Paint a cartoon face consistent with the landmarks (in place)."""
    hull = cv2.convexHull(lms.astype(np.int32))
    cv2.fillConvexPoly(img, hull, skin)
    for base in (36, 42):
        eye = lms[base: base + 6].astype(np.int32)
        cv2.fillConvexPoly(img, cv2.convexHull(eye), (250, 250, 250))
        c = eye.mean(axis=0).astype(int)
        cv2.circle(img, tuple(c), 3, (30, 30, 90), -1)
    nose = lms[27:36].astype(np.int32)
    cv2.polylines(img, [nose[:4]], False, (140, 90, 60), 2)
    mouth = lms[48:68].astype(np.int32)
    cv2.fillConvexPoly(img, cv2.convexHull(mouth), (150, 40, 50))


def textured_background(
    rng: np.random.Generator, size: int
) -> np.ndarray:
    noise = rng.integers(0, 255, (size // 8, size // 8, 3), np.uint8)
    return cv2.resize(noise, (size, size), interpolation=cv2.INTER_CUBIC)


def generate_video(
    out_dir: str,
    n_frames: int,
    *,
    size: int = 256,
    seed: int = 0,
    skin: Tuple[int, int, int] = (210, 170, 140),
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    bg = textured_background(rng, size)
    cx0, cy0 = size / 2 + rng.uniform(-20, 20), size / 2 + rng.uniform(-20, 20)
    scale = size * rng.uniform(0.22, 0.3)
    phase = rng.uniform(0, 2 * np.pi)

    for f in range(n_frames):
        cx = cx0 + 10 * np.sin(0.2 * f + phase)
        cy = cy0 + 6 * np.cos(0.15 * f + phase)
        ang = 5 * np.sin(0.1 * f + phase)
        lms = face_landmarks((cx, cy), scale, ang)
        img = bg.copy()
        draw_face(img, lms, skin)
        cv2.imwrite(
            osp.join(out_dir, f"{f:05d}.jpg"),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
        )
        np.savez(osp.join(out_dir, f"{f:05d}_landmarks.npz"), landmark=lms)


def generate_dataset(
    root: str, n_videos: int = 2, n_frames: int = 12, size: int = 256, seed: int = 0
) -> str:
    """Write a small synthetic dataset; returns `root`."""
    for v in range(n_videos):
        skin = (
            180 + 15 * (v % 4),
            150 + 10 * ((v + 1) % 5),
            120 + 12 * ((v + 2) % 6),
        )
        generate_video(
            osp.join(root, f"video_{v:03d}"),
            n_frames,
            size=size,
            seed=seed * 1000 + v,
            skin=skin,
        )
    return root
