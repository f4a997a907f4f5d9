"""Stage 2 preprocessing: face clips -> per-frame landmark npz + frames.

Behavioural port of reference preprocessing/landmark_generation.py:58-361,
writing the on-disk contract the training dataset consumes (see
faceoff_tpu/data/dataset.py): per clip, a directory of `NNNNN.jpg` frames
plus `NNNNN_landmarks.npz` files (key 'landmark', (68, 2) float pixel
coords on the resized frame). Videos where more than `max_bad_frac` of
frames fail landmarking are quarantined (skipped and reported), mirroring
the reference's bad-video lists (landmark_generation.py:186-191).
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import List, Optional, Tuple

import cv2
import numpy as np

from faceoff_tpu.data.geometry import resize_frame
from faceoff_tpu.io.video import read_video_frames
from faceoff_tpu.preprocess.detectors import default_landmarker

MAX_BAD_FRACTION = 0.10  # reference landmark_generation.py:122-124


def generate_landmarks_for_video(
    video_path: str,
    out_dir: Optional[str] = None,
    *,
    landmarker=None,
    resolution: int = 256,
    max_bad_frac: float = MAX_BAD_FRACTION,
    batch_size: int = 32,
) -> Tuple[bool, int, int]:
    """Process one clip. Returns (ok, n_written, n_bad).

    ok=False means the video was quarantined (too many frames without a
    valid 68-point detection) and nothing was written.
    """
    landmarker = landmarker or default_landmarker()
    out_dir = out_dir or osp.splitext(video_path)[0]

    frames = read_video_frames(video_path)
    if not frames:
        return False, 0, 0
    resized = [resize_frame(f, resolution) for f in frames]

    all_lms: List[Optional[np.ndarray]] = []
    if getattr(landmarker, "tracks_across_frames", False):
        # trackers carry state frame-to-frame: chunking would reset the
        # track (and re-anchor to the rigid detection) every batch_size
        # frames — feed the whole clip in one call
        all_lms = landmarker.landmarks(resized)
    else:
        for i in range(0, len(resized), batch_size):
            all_lms += landmarker.landmarks(resized[i: i + batch_size])

    def valid(lm):
        return lm is not None and lm.shape == (68, 2)

    n_bad = sum(0 if valid(lm) else 1 for lm in all_lms)
    if n_bad > max_bad_frac * len(all_lms):
        return False, 0, n_bad

    os.makedirs(out_dir, exist_ok=True)
    n_written = 0
    for i, (frame, lm) in enumerate(zip(resized, all_lms)):
        if not valid(lm):
            continue  # skip bad frames, keep numbering consecutive w/ index
        cv2.imwrite(
            osp.join(out_dir, f"{i:05d}.jpg"),
            cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
        )
        np.savez(
            osp.join(out_dir, f"{i:05d}_landmarks.npz"),
            landmark=np.asarray(lm, np.float32),
        )
        n_written += 1
    return True, n_written, n_bad


def generate_landmarks_for_dataset(
    clips_root: str, *, landmarker=None, num_workers: int = 4, **kwargs
) -> Tuple[List[str], List[str]]:
    """Process every clip under clips_root in a worker pool; returns
    (ok, quarantined) paths (reference detect_face_generate_landmarks
    :218-361 + its ThreadPoolExecutor driver :364-379)."""
    from concurrent.futures import ThreadPoolExecutor

    paths = sorted(glob(osp.join(clips_root, "**", "*.mp4"), recursive=True))
    ok_list: List[str] = []
    bad_list: List[str] = []

    def work(path):
        ok, _, _ = generate_landmarks_for_video(
            path, landmarker=landmarker, **kwargs
        )
        return path, ok

    with ThreadPoolExecutor(max(1, num_workers)) as pool:
        for path, ok in pool.map(work, paths):
            (ok_list if ok else bad_list).append(path)
    return ok_list, bad_list
