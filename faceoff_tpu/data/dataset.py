"""Video dataset with on-the-fly perturbation — the training data engine.

Behavioural port of reference TemporalAlignment/dataset.py:210-420 with an
explicit on-disk contract (the reference leaves it implicit, SURVEY §3.5):

    <root>/<video_id>/
        00000.jpg | 00000.png        frames (any resolution; resized+padded
                                     to 256x256 on load)
        00000_landmarks.npz          key 'landmark': (68, 2) float pixel
                                     coords on the *resized* 256x256 frame

Item modes (reference dataset.py:280-292):
  * self-supervised train (`jitter`): segment the video's own face hull,
    perturb it, learn to reconstruct the original frame;
  * cross-identity validation: warp a random other video's face onto this
    video's frames;
  * custom validation: a fixed (source video, target video) pair;
  * alignment: returns the negated ground-truth transform amounts for the
    alignment-regression head.

All arrays are channels-last float32 in [-1, 1] of shape (T, H, W, C).
Randomness is explicit per call (numpy Generator) for reproducibility.
"""

from __future__ import annotations

import os.path as osp
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from faceoff_tpu.data import geometry, perturbations


def _frame_index(path: str) -> int:
    return int(osp.basename(path).split("_")[0])


def list_videos(
    root: str,
    min_landmark_files: int = 3,
    exclude_list: Optional[str] = None,
) -> List[str]:
    """Discover video directories (any nesting depth) with enough landmark
    files (reference dataset.py:190-208 globs fixed nesting levels and
    filters on landmark counts; here discovery is recursive so preprocess
    output trees work directly).

    exclude_list: optional JSON file with directory names/paths to skip —
    the role of the reference's curation lists (bad_mp4s.json,
    valid_folders_ft.json at repo root)."""
    excluded = set()
    if exclude_list:
        import json

        with open(exclude_list) as f:
            for entry in json.load(f):
                excluded.add(osp.normpath(entry))
                excluded.add(osp.basename(osp.normpath(entry)))

    roots = set()
    for lm in glob(osp.join(root, "**", "*_landmarks.npz"), recursive=True):
        roots.add(osp.dirname(lm))
    videos = [
        d for d in sorted(roots)
        if len(glob(osp.join(d, "*_landmarks.npz"))) > min_landmark_files
        and osp.normpath(d) not in excluded
        and osp.basename(osp.normpath(d)) not in excluded
    ]
    return videos


def _landmark_paths(video_dir: str) -> List[str]:
    return sorted(
        glob(osp.join(video_dir, "*_landmarks.npz")), key=_frame_index
    )


def _image_for_landmark(lm_path: str) -> str:
    stem = lm_path.rsplit("_", 1)[0]
    for ext in (".jpg", ".png"):
        if osp.exists(stem + ext):
            return stem + ext
    raise FileNotFoundError(f"no frame image for {lm_path}")


def load_frame(lm_path: str, resolution: int = 256):
    """Load (resized frame uint8 RGB, landmarks (68,2))."""
    import cv2

    img = cv2.imread(_image_for_landmark(lm_path), cv2.IMREAD_COLOR)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = geometry.resize_frame(img, resolution)
    lms = np.load(lm_path, allow_pickle=True)["landmark"]
    return img, np.asarray(lms, np.float32)


def load_window_frames(
    lm_paths: Sequence[str], resolution: int = 256
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch-load a clip window: (frames (T, res, res, 3) uint8,
    landmarks (T, 68, 2)). Uses the native C++ decoder
    (faceoff_tpu.native) when every frame is a JPEG; falls back to the
    per-frame cv2 path otherwise."""
    image_paths = [_image_for_landmark(p) for p in lm_paths]
    frames: Optional[np.ndarray] = None
    if all(p.endswith(".jpg") for p in image_paths):
        try:
            from faceoff_tpu import native

            if native.available():
                frames = native.load_frames(image_paths, resolution)
        except Exception:
            frames = None
    if frames is None:
        frames = np.stack(
            [load_frame(p, resolution)[0] for p in lm_paths]
        )
    lms = np.stack(
        [
            np.load(p, allow_pickle=True)["landmark"].astype(np.float32)
            for p in lm_paths
        ]
    )
    return frames, lms


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (reference dataset.py:244-247)."""
    return img.astype(np.float32) / 127.5 - 1.0


def denormalize(img: np.ndarray) -> np.ndarray:
    return np.clip(np.rint((img + 1.0) * 127.5), 0, 255).astype(np.uint8)


def to_grayscale3(img: np.ndarray) -> np.ndarray:
    """Luma grayscale replicated to 3 channels (reference --gray flag,
    dataset.py:237-241)."""
    gray = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(img.dtype)
    return np.stack([gray] * 3, axis=-1)


def color_jitter(
    img: np.ndarray, brightness: float, saturation: float
) -> np.ndarray:
    """Brightness/saturation jitter on uint8 RGB (reference dataset.py:252-257:
    ColorJitter(brightness=(1.0,1.5), saturation=(1.0,1.5)))."""
    out = img.astype(np.float32) * brightness
    gray = (
        0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
    )[..., None]
    out = gray + saturation * (out - gray)
    return np.clip(out, 0, 255).astype(np.uint8)


class TemporalAlignmentDataset:
    """See module docstring. `mode` in {'train', 'val'}."""

    def __init__(
        self,
        root: str,
        mode: str,
        max_frame_len: int,
        *,
        resolution: int = 256,
        color_jitter_type: str = "",
        cross_identity: bool = False,
        grayscale: bool = False,
        custom_validation_source: Optional[str] = None,
        hull_start: int = 17,
        hull_end: int = 67,
        mask_enlargement: int = 10,
        min_landmark_files: int = 3,
        use_bb_mask: bool = False,
        exclude_list: Optional[str] = None,
        alignment: bool = False,
        naive_blend: str = "",
    ):
        self.mode = mode
        # alignment-regression items (reference dataset.py:377-397):
        # get_item also returns the negated GT transforms to regress
        self.alignment = alignment
        self.max_len = max_frame_len
        self.resolution = resolution
        self.cross_identity = cross_identity
        self.grayscale = grayscale
        self.hull_slice = slice(hull_start, hull_end)
        self.mask_enlargement = mask_enlargement
        # bounding-box masks instead of convex hulls (`requires_bb`,
        # reference dataset.py:23,41-44 + the _bb geometry variant)
        self.use_bb_mask = use_bb_mask
        # cross-id disables colour jitter (reference dataset.py:227-228)
        self.color_jitter_type = "" if cross_identity else color_jitter_type
        # '', 'paste' or 'poisson': cross-id items also return the naive
        # blended composite baseline ('combined', reference
        # face_translation_videos3_utils.py:184-190) as a 'naive' stream
        if naive_blend not in ("", "paste", "poisson"):
            raise ValueError(f"unknown naive_blend '{naive_blend}'")
        self.naive_blend = naive_blend

        self.videos = list_videos(root, min_landmark_files, exclude_list)
        if not self.videos:
            raise FileNotFoundError(f"no usable videos under {root}")

        self.source_videos: Optional[List[str]] = None
        if custom_validation_source is not None:
            self.source_videos = list_videos(
                custom_validation_source, min_landmark_files
            )

    def __len__(self) -> int:
        return len(self.videos)

    # -- frame-window sampling -------------------------------------------

    def _sample_window(
        self, paths: Sequence[str], rng: np.random.Generator, start: Optional[int] = None
    ) -> Sequence[str]:
        """Random max_len window. Unlike the reference (whose random start
        can overrun short videos, yielding ragged clips tolerated by eager
        torch — dataset.py:62), the start is clamped and short videos pad
        by repeating the last frame: XLA requires static clip shapes."""
        if start is None:
            hi = max(0, len(paths) - self.max_len)
            start = int(rng.integers(0, hi + 1))
        else:
            start = min(start, max(0, len(paths) - self.max_len))
        window = list(paths[start: start + self.max_len])
        while window and len(window) < self.max_len:
            window.append(window[-1])
        return window

    def _face_mask(self, img, lms):
        if self.use_bb_mask:
            return geometry.bounding_box_mask(img.shape, lms[self.hull_slice])
        return geometry.convex_hull_mask(img.shape, lms[self.hull_slice])

    # -- self-supervised item (reference dataset.py:356-375) -------------

    def get_item_jitter(
        self, index: int, rng: np.random.Generator
    ) -> Dict[str, np.ndarray]:
        video_dir = self.videos[index]
        window = self._sample_window(_landmark_paths(video_dir), rng)
        if not window:
            raise RuntimeError(f"empty video dir {video_dir}")

        if self.color_jitter_type == "const":
            b = float(rng.uniform(1.0, 1.5))
            s = float(rng.uniform(1.0, 1.5))

        sources, backgrounds, originals = [], [], []
        for lm_path in window:
            img, lms = load_frame(lm_path, self.resolution)
            if self.grayscale:
                img = to_grayscale3(img)
            mask = self._face_mask(img, lms)
            face = geometry.apply_mask(mask, img)
            background = geometry.apply_mask(255 - mask, img)
            perturbed, _ = perturbations.perturb_image_composite(face, lms, rng)

            if self.color_jitter_type == "random":
                perturbed = color_jitter(
                    perturbed, float(rng.uniform(1.0, 1.5)),
                    float(rng.uniform(1.0, 1.5)),
                )
            elif self.color_jitter_type == "const":
                perturbed = color_jitter(perturbed, b, s)

            sources.append(normalize(perturbed))
            backgrounds.append(normalize(background))
            originals.append(normalize(img))

        return {
            "source": np.stack(sources),
            "background": np.stack(backgrounds),
            "gt": np.stack(originals),
        }

    # -- alignment-regression item (reference dataset.py:377-397) --------

    def get_item_alignment(
        self, index: int, rng: np.random.Generator
    ) -> Dict[str, np.ndarray]:
        video_dir = self.videos[index]
        window = self._sample_window(_landmark_paths(video_dir), rng)
        sources, backgrounds, originals, gts = [], [], [], []
        for lm_path in window:
            img, lms = load_frame(lm_path, self.resolution)
            mask = self._face_mask(img, lms)
            face = geometry.apply_mask(mask, img)
            background = geometry.apply_mask(255 - mask, img)
            perturbed, gt_t = perturbations.perturb_image_composite(
                face, lms, rng
            )
            sources.append(normalize(perturbed))
            backgrounds.append(normalize(background))
            originals.append(normalize(img))
            # regress the inverse of the applied transform
            gts.append(
                [
                    -gt_t["rotate_image"],
                    -gt_t["translate_horizontal"],
                    -gt_t["translate_vertical"],
                ]
            )
        return {
            "source": np.stack(sources),
            "background": np.stack(backgrounds),
            "gt": np.stack(originals),
            "transforms": np.asarray(gts, np.float32),
        }

    # -- cross-identity item (reference dataset.py:341-354) --------------

    def get_item_cross_identity(
        self,
        index: int,
        rng: np.random.Generator,
        target_index: Optional[int] = None,
        keep_same_index: bool = False,
    ) -> Dict[str, np.ndarray]:
        source_dir = self.videos[index]
        if self.source_videos is not None:
            # custom validation: paired lists (reference dataset.py:298-316)
            target_dir = self.source_videos[index % len(self.source_videos)]
        elif target_index is not None:
            target_dir = self.videos[target_index]
        else:
            target_dir = self.videos[int(rng.integers(0, len(self.videos)))]

        src_paths = _landmark_paths(source_dir)
        tgt_paths = _landmark_paths(target_dir)
        if keep_same_index or self.source_videos is not None:
            s0 = t0 = 0
        else:
            s0 = int(rng.integers(0, max(5, len(src_paths) - self.max_len - 1) + 1))
            t0 = int(rng.integers(0, max(5, len(tgt_paths) - self.max_len - 1) + 1))
        # clamp + pad to the static clip length (same policy as
        # _sample_window: the reference tolerates ragged clips, XLA does
        # not — short/overrun windows repeat their last frame)
        s0 = min(s0, max(0, len(src_paths) - self.max_len))
        t0 = min(t0, max(0, len(tgt_paths) - self.max_len))
        src_w = list(src_paths[s0: s0 + self.max_len])
        tgt_w = list(tgt_paths[t0: t0 + self.max_len])
        for w in (src_w, tgt_w):
            while w and len(w) < self.max_len:
                w.append(w[-1])

        sources, target_bgs, targets, src_imgs = [], [], [], []
        naives = []
        for sp, tp in zip(src_w, tgt_w):
            s_img, s_lms = load_frame(sp, self.resolution)
            t_img, t_lms = load_frame(tp, self.resolution)
            out = geometry.generate_warped_image(
                s_lms, t_lms, s_img, t_img,
                enlargement=self.mask_enlargement,
                poisson=(self.naive_blend == "poisson"),
            )
            sources.append(normalize(out["source_face_transformed"]))
            targets.append(normalize(out["target_image"]))
            target_bgs.append(normalize(out["target_without_face_features"]))
            src_imgs.append(normalize(out["source_image"]))
            if self.naive_blend:
                naives.append(normalize(out["combined"]))

        item = {
            "source": np.stack(sources),
            "background": np.stack(target_bgs),
            "gt": np.stack(targets),
            "source_original": np.stack(src_imgs),
        }
        if self.naive_blend:
            item["naive"] = np.stack(naives)
        return item

    # -- dispatch (reference dataset.py:280-292) -------------------------

    def __getitem__(self, index: int, rng=None) -> Dict[str, np.ndarray]:
        return self.get_item(index, rng or np.random.default_rng(index))

    def get_item(self, index: int, rng: np.random.Generator):
        if self.alignment:
            return self.get_item_alignment(index, rng)
        if self.cross_identity or self.source_videos is not None:
            return self.get_item_cross_identity(index, rng)
        return self.get_item_jitter(index, rng)


def pack_batch(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-clip dicts into (B, T, H, W, C) arrays and build the
    6-channel model input (reference utils.py:29-38 process_data). Extra
    streams (e.g. cross-identity 'source_original',
    reference train_faceoff_perceptual.py:57-67) pass through stacked."""
    source = np.stack([it["source"] for it in items])
    background = np.stack([it["background"] for it in items])
    gt = np.stack([it["gt"] for it in items])
    batch = {
        "input": np.concatenate([source, background], axis=-1),
        "gt": gt,
    }
    for key in items[0]:
        if key not in ("source", "background", "gt"):
            batch[key] = np.stack([it[key] for it in items])
    return batch
