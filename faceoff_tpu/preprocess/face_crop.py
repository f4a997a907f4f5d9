"""Stage 1 preprocessing: raw videos -> constant-crop face clips.

Behavioural port of reference preprocessing/preprocess_dataset.py:165-283:
detect a face box per frame, track it with an IoU >= 0.7 stability
criterion, segment the video wherever the box jumps, average the boxes of
each stable segment into one constant crop, and write every segment of at
least `min_frames` frames as its own clip. Videos are processed in
memory-bounded chunks (default 8000 frames, reference :249-251).
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from faceoff_tpu.preprocess.detectors import Box, default_detector

IOU_THRESHOLD = 0.7  # reference preprocess_dataset.py:169
MIN_CLIP_FRAMES = 30  # reference :199
CHUNK_FRAMES = 8000  # reference :249


def iou(a: Box, b: Box) -> float:
    """Intersection-over-union of two (x1, y1, x2, y2) boxes
    (reference preprocess_dataset.py:25-47)."""
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(ix2 - ix1, 0), max(iy2 - iy1, 0)
    inter = iw * ih
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def square_crop_box(box: Box, frame_shape, margin: float = 0.25) -> Box:
    """Expand a face box into a margin-padded square crop clamped to the
    frame (role of reference crop_face_coordinates :114-131)."""
    h, w = frame_shape[:2]
    x1, y1, x2, y2 = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    half = max(x2 - x1, y2 - y1) * (1 + margin) / 2
    return (
        int(max(cx - half, 0)),
        int(max(cy - half, 0)),
        int(min(cx + half, w)),
        int(min(cy + half, h)),
    )


def segment_stable_boxes(
    boxes: Sequence[Optional[Box]],
    iou_threshold: float = IOU_THRESHOLD,
    min_frames: int = MIN_CLIP_FRAMES,
) -> List[Tuple[int, int, Box]]:
    """Split a per-frame box track into stable segments.

    Returns [(start, end_exclusive, mean_box)] for every run of consecutive
    detections whose IoU with the running segment stays >= threshold and
    whose length is >= min_frames (reference preprocess_dataset.py:165-234).
    """
    segments: List[Tuple[int, int, Box]] = []
    start: Optional[int] = None
    acc: List[Box] = []

    def flush(end: int):
        nonlocal start, acc
        if start is not None and end - start >= min_frames:
            mean = tuple(int(v) for v in np.mean(acc, axis=0))
            segments.append((start, end, mean))  # type: ignore[arg-type]
        start, acc = None, []

    for i, box in enumerate(boxes):
        if box is None:
            flush(i)
            continue
        if start is None:
            start, acc = i, [box]
        elif iou(acc[-1], box) >= iou_threshold:
            acc.append(box)
        else:
            flush(i)
            start, acc = i, [box]
    flush(len(boxes))
    return segments


def process_video(
    video_path: str,
    out_dir: str,
    *,
    detector=None,
    resolution: int = 256,
    min_frames: int = MIN_CLIP_FRAMES,
    chunk_frames: int = CHUNK_FRAMES,
    fps: int = 25,
) -> List[str]:
    """Crop one raw video into stable face clips; returns written paths
    (reference process_video :241-283 + crop_get_video :94-108)."""
    detector = detector or default_detector()
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    written: List[str] = []
    clip_idx = 0
    try:
        while True:
            frames: List[np.ndarray] = []
            while len(frames) < chunk_frames:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if not frames:
                break

            boxes = [detector.detect(f) for f in frames]
            for start, end, mean_box in segment_stable_boxes(
                boxes, min_frames=min_frames
            ):
                crop = square_crop_box(mean_box, frames[0].shape)
                x1, y1, x2, y2 = crop
                out_path = osp.join(out_dir, f"{clip_idx:05d}.mp4")
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                    (resolution, resolution),
                )
                for f in frames[start:end]:
                    c = f[y1:y2, x1:x2]
                    c = cv2.resize(c, (resolution, resolution))
                    writer.write(cv2.cvtColor(c, cv2.COLOR_RGB2BGR))
                writer.release()
                written.append(out_path)
                clip_idx += 1

            if len(frames) < chunk_frames:
                break
    finally:
        cap.release()
    return written


def process_videos(
    video_dir: str, out_root: str, *, detector=None, **kwargs
) -> List[str]:
    """Process every video under video_dir (reference process_videos :288-293)."""
    written: List[str] = []
    for path in sorted(glob(osp.join(video_dir, "*.mp4"))):
        name = osp.splitext(osp.basename(path))[0]
        written += process_video(
            path, osp.join(out_root, name), detector=detector, **kwargs
        )
    return written
