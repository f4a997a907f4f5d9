"""Video read/write helpers (reference utils.py:9-17 save path; cv2-based)."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import cv2
import numpy as np


def save_frames_as_video(
    frames: Sequence[np.ndarray], video_path: str, fps: int = 25
) -> None:
    """Write float [0,1] or uint8 RGB frames as mp4 (reference
    utils.py:9-17; canonical fps=25 per train_faceoff_perceptual.py:79)."""
    if len(frames) == 0:
        raise ValueError("no frames to write")
    os.makedirs(os.path.dirname(video_path) or ".", exist_ok=True)
    first = np.asarray(frames[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(
        video_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    try:
        for frame in frames:
            f = np.asarray(frame)
            if f.dtype != np.uint8:
                f = np.clip(np.rint(f * 255.0), 0, 255).astype(np.uint8)
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()


def save_image_grid(
    frames: Sequence[np.ndarray], path: str, nrow: Optional[int] = None
) -> None:
    """Tile frames into one PNG grid (role of reference utils.py:19-26
    save_image / torchvision make_grid). Frames: uint8 or [0,1] float RGB."""
    if len(frames) == 0:
        raise ValueError("no frames")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrs = []
    for f in frames:
        a = np.asarray(f)
        if a.dtype != np.uint8:
            a = np.clip(np.rint(a * 255.0), 0, 255).astype(np.uint8)
        arrs.append(a)
    n = len(arrs)
    nrow = nrow or max(n // 2, 1)
    ncol = (n + nrow - 1) // nrow
    h, w = arrs[0].shape[:2]
    grid = np.zeros((nrow * h, ncol * w, 3), np.uint8)
    for i, a in enumerate(arrs):
        r, c = divmod(i, ncol)
        grid[r * h: (r + 1) * h, c * w: (c + 1) * w] = a
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))


def read_video_frames(
    video_path: str, max_frames: Optional[int] = None
) -> List[np.ndarray]:
    """Read an mp4 into a list of uint8 RGB frames."""
    cap = cv2.VideoCapture(video_path)
    frames: List[np.ndarray] = []
    try:
        while max_frames is None or len(frames) < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    return frames
