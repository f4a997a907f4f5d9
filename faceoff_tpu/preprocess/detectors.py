"""Pluggable face detection / landmark backends for offline preprocessing.

The reference hard-depends on mediapipe for detection
(reference preprocessing/preprocess_dataset.py:134-157) and on
face_alignment for 68-point landmarks
(reference preprocessing/landmark_generation.py:43-56). Neither ships in
every environment (nor in this image), so the pipeline here programs
against two small protocols with auto-selected backends:

  FaceDetector.detect(frame) -> (x1, y1, x2, y2) | None
  Landmarker.landmarks(frame_batch) -> list[(68, 2) array | None]

Backends, best-first:
  * MediapipeDetector / FaceAlignmentLandmarker — used when the libraries
    are importable (drop-in parity with the reference).
  * OpenCV FaceDetectorYN — used when an ONNX model path is supplied.
  * HeuristicDetector + FlowTrackingLandmarker — self-contained fallback:
    skin-prior + largest-connected-region detection; 68 landmarks
    synthesized from the face box with the canonical iBUG layout, then
    TRACKED frame-to-frame with pyramidal Lucas-Kanade optical flow
    (forward-backward checked, drift-re-detected) so the layout carries
    real per-point expression/pose motion. Still not production-quality
    real-face landmarks — install mediapipe/face_alignment for that —
    but far beyond the rigid box synthesis of rounds 1-3.
  * BoxLandmarker — the bare rigid synthesis, kept for comparison/tests.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

Box = Tuple[int, int, int, int]


# ---------------------------------------------------------------- detectors


class HeuristicDetector:
    """Skin-prior face detector: YCrCb skin mask -> largest blob -> box.

    Self-contained (no model files). Confidence is the blob's fill ratio.
    """

    def __init__(self, min_area_frac: float = 0.005):
        self.min_area_frac = min_area_frac

    def detect(self, frame_rgb: np.ndarray) -> Optional[Box]:
        ycrcb = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2YCrCb)
        # classic skin cluster in CrCb
        mask = cv2.inRange(
            ycrcb, np.array([0, 133, 77]), np.array([255, 180, 135])
        )
        mask = cv2.morphologyEx(
            mask, cv2.MORPH_CLOSE, np.ones((7, 7), np.uint8)
        )
        n, labels, stats, _ = cv2.connectedComponentsWithStats(mask)
        if n <= 1:
            return None
        # largest non-background component
        areas = stats[1:, cv2.CC_STAT_AREA]
        best = int(np.argmax(areas)) + 1
        h, w = frame_rgb.shape[:2]
        if stats[best, cv2.CC_STAT_AREA] < self.min_area_frac * h * w:
            return None
        x = int(stats[best, cv2.CC_STAT_LEFT])
        y = int(stats[best, cv2.CC_STAT_TOP])
        bw = int(stats[best, cv2.CC_STAT_WIDTH])
        bh = int(stats[best, cv2.CC_STAT_HEIGHT])
        return (x, y, x + bw, y + bh)


class MediapipeDetector:
    """mediapipe face detection (parity with reference
    preprocess_dataset.py:134-157). Raises ImportError when unavailable."""

    def __init__(self, min_confidence: float = 0.5):
        import mediapipe as mp  # noqa: F401

        self._mp = mp
        self._det = mp.solutions.face_detection.FaceDetection(
            model_selection=0, min_detection_confidence=min_confidence
        )

    def detect(self, frame_rgb: np.ndarray) -> Optional[Box]:
        res = self._det.process(frame_rgb)
        if not res.detections:
            return None
        h, w = frame_rgb.shape[:2]
        d = res.detections[0].location_data.relative_bounding_box
        x1 = max(int(d.xmin * w), 0)
        y1 = max(int(d.ymin * h), 0)
        return (x1, y1, min(int((d.xmin + d.width) * w), w),
                min(int((d.ymin + d.height) * h), h))


class YunetDetector:
    """OpenCV FaceDetectorYN with a user-supplied ONNX model."""

    def __init__(self, model_path: str, score_threshold: float = 0.6):
        self._det = cv2.FaceDetectorYN_create(
            model_path, "", (320, 320), score_threshold
        )

    def detect(self, frame_rgb: np.ndarray) -> Optional[Box]:
        h, w = frame_rgb.shape[:2]
        self._det.setInputSize((w, h))
        _, faces = self._det.detect(
            cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR)
        )
        if faces is None or len(faces) == 0:
            return None
        x, y, bw, bh = faces[0][:4].astype(int)
        return (max(x, 0), max(y, 0), min(x + bw, w), min(y + bh, h))


def default_detector():
    """Best available detector."""
    try:
        return MediapipeDetector()
    except ImportError:
        return HeuristicDetector()


# --------------------------------------------------------------- landmarkers


class BoxLandmarker:
    """68 landmarks synthesized from the detected face box in the canonical
    iBUG layout (jaw 0-16, brows 17-26, nose 27-35, eyes 36-47, mouth
    48-67). Geometry-only fallback — see module docstring."""

    def __init__(self, detector=None):
        self.detector = detector or default_detector()

    def landmarks(
        self, frames_rgb: Sequence[np.ndarray]
    ) -> List[Optional[np.ndarray]]:
        from faceoff_tpu.data.synthetic import face_landmarks

        out: List[Optional[np.ndarray]] = []
        for frame in frames_rgb:
            box = self.detector.detect(frame)
            if box is None:
                out.append(None)
                continue
            x1, y1, x2, y2 = box
            cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
            scale = max(x2 - x1, y2 - y1) / 2.2
            out.append(face_landmarks((cx, cy), scale))
        return out


class FlowTrackingLandmarker:
    """BoxLandmarker upgraded with pyramidal Lucas-Kanade point tracking:
    detect the canonical 68-point layout once, then TRACK each point
    frame-to-frame with cv2.calcOpticalFlowPyrLK (forward-backward
    consistency check), re-detecting on drift or track loss.

    Why: the rigid box synthesis gives every frame the same layout up to
    the box transform, so the self-supervised training signal carries no
    non-rigid facial motion and cross-identity alignment is box-accurate
    only. Per-point LK tracking recovers the actual expression/pose motion
    the reference corpus carries via face_alignment landmarks (reference
    preprocessing/landmark_generation.py:58-118) — pure cv2, no new
    dependencies.

    Per frame: track all 68 points forward, track the results backward,
    keep points whose round trip lands within `fb_thresh` px. Lost points
    are re-anchored by the similarity transform fitted on the surviving
    points (so they move rigidly-with-the-face instead of sticking).
    When fewer than `min_valid_frac` survive, or the tracked hull center
    drifts more than half a box size from the detector's current box, the
    layout re-detects from scratch.
    """

    # the preprocess driver feeds trackers whole clips (no chunk resets)
    tracks_across_frames = True

    def __init__(
        self,
        detector=None,
        *,
        fb_thresh: float = 1.5,
        min_valid_frac: float = 0.6,
        win_size: int = 21,
        max_level: int = 3,
    ):
        self.detector = detector or default_detector()
        self._base = BoxLandmarker(self.detector)
        self.fb_thresh = fb_thresh
        self.min_valid_frac = min_valid_frac
        self._lk = dict(
            winSize=(win_size, win_size),
            maxLevel=max_level,
            criteria=(
                cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01
            ),
        )

    def _track(self, prev_gray, gray, prev_pts):
        """One LK step with forward-backward check. Returns
        (points (68, 2) float32, valid (68,) bool) or None on failure."""
        p0 = prev_pts.reshape(-1, 1, 2).astype(np.float32)
        p1, st, _ = cv2.calcOpticalFlowPyrLK(
            prev_gray, gray, p0, None, **self._lk
        )
        if p1 is None:
            return None
        p0_back, st_back, _ = cv2.calcOpticalFlowPyrLK(
            gray, prev_gray, p1, None, **self._lk
        )
        if p0_back is None:
            return None
        fb = np.linalg.norm(
            (p0_back - p0).reshape(-1, 2), axis=1
        )
        valid = (
            (st.reshape(-1) == 1)
            & (st_back.reshape(-1) == 1)
            & (fb < self.fb_thresh)
        )
        return p1.reshape(-1, 2).astype(np.float32), valid

    def _fill_lost(self, prev_pts, pts, valid):
        """Re-anchor lost points with the similarity transform fitted on
        the surviving ones (they move with the face, not freeze)."""
        if valid.all():
            return pts
        from faceoff_tpu.data.geometry import umeyama_similarity

        if valid.sum() >= 3:
            M = umeyama_similarity(prev_pts[valid], pts[valid])
            moved = prev_pts[~valid] @ M[:, :2].T + M[:, 2]
            pts = pts.copy()
            pts[~valid] = moved.astype(np.float32)
        else:
            pts = pts.copy()
            pts[~valid] = prev_pts[~valid]
        return pts

    def _drifted(self, pts, frame) -> bool:
        """Tracked hull center vs the detector's current box center."""
        box = self.detector.detect(frame)
        if box is None:
            return False  # no detection to anchor against: trust the track
        x1, y1, x2, y2 = box
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        half = max(x2 - x1, y2 - y1) / 2.0
        center = pts.mean(axis=0)
        return bool(
            np.hypot(center[0] - cx, center[1] - cy) > max(half, 1.0)
        )

    def landmarks(
        self, frames_rgb: Sequence[np.ndarray]
    ) -> List[Optional[np.ndarray]]:
        out: List[Optional[np.ndarray]] = []
        prev_gray = None
        prev_pts: Optional[np.ndarray] = None
        for frame in frames_rgb:
            gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY)
            pts: Optional[np.ndarray] = None
            if prev_pts is not None:
                tracked = self._track(prev_gray, gray, prev_pts)
                if tracked is not None:
                    cand, valid = tracked
                    if (
                        valid.mean() >= self.min_valid_frac
                        and not self._drifted(cand, frame)
                    ):
                        pts = self._fill_lost(prev_pts, cand, valid)
            if pts is None:  # first frame, track loss, or drift: re-detect
                pts = self._base.landmarks([frame])[0]
            out.append(pts)
            prev_gray = gray
            prev_pts = pts
        return out


class FaceAlignmentLandmarker:
    """face_alignment 2D 68-point landmarks with the reference's
    OOM-halving retry (reference landmark_generation.py:104-118)."""

    def __init__(self, device: str = "cpu", batch_size: int = 32):
        import face_alignment

        self._fa = face_alignment.FaceAlignment(
            face_alignment.LandmarksType.TWO_D, device=device
        )
        self.batch_size = batch_size

    def _chunk(self, frames: List[np.ndarray]) -> List[Optional[np.ndarray]]:
        res = []
        for frame in frames:
            pts = self._fa.get_landmarks(frame)
            res.append(np.asarray(pts[0], np.float32) if pts else None)
        return res

    def landmarks(
        self, frames_rgb: Sequence[np.ndarray]
    ) -> List[Optional[np.ndarray]]:
        """Every frame is processed exactly once: work advances chunk by
        chunk; an OOM-style RuntimeError halves the chunk size and retries
        the SAME chunk (partial results discarded), so the output always
        aligns 1:1 with frames_rgb — the reference re-chunks all frames at
        the halved batch size (reference landmark_generation.py:104-118)."""
        frames = list(frames_rgb)
        out: List[Optional[np.ndarray]] = []
        pos, size = 0, max(1, self.batch_size)
        while pos < len(frames):
            chunk = frames[pos : pos + size]
            try:
                out.extend(self._chunk(chunk))
                pos += len(chunk)
            except RuntimeError:
                if size <= 1:
                    raise
                size = size // 2
        return out


def default_landmarker():
    try:
        return FaceAlignmentLandmarker()
    except ImportError:
        # flow tracking subsumes the rigid box synthesis: same canonical
        # layout at (re-)detection, real per-point motion in between
        return FlowTrackingLandmarker()
